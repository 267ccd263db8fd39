from . import windows, cdc  # noqa: F401
