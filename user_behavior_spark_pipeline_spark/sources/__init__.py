from .tables import TABLES, load_table, register_all  # noqa: F401
