from . import seq_dp  # noqa: F401
