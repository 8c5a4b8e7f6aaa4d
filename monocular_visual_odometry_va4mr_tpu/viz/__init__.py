from .dashboard import render_dashboard  # noqa: F401
