from .testdata import TABLES, load_star, load_table, register_views

__all__ = ["TABLES", "load_star", "load_table", "register_views"]
