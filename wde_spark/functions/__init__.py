from . import strings  # noqa: F401
