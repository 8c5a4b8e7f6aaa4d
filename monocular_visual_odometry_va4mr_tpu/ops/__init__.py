from . import image, corners, klt  # noqa: F401
