from . import corners, image, klt, klt_pallas  # noqa: F401
