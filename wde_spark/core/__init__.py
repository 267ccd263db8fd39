from .session import get_session
from .catalog import TABLES, load_table, register_views

__all__ = ["get_session", "load_table", "register_views", "TABLES"]
