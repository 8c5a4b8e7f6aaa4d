from . import camera, config, lie, slots, state  # noqa: F401
