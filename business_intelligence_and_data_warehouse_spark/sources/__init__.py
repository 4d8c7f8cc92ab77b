from . import csv, warehouse
from .testdata import TABLES, load_star, load_table, register_views

__all__ = ["TABLES", "csv", "load_star", "load_table", "register_views", "warehouse"]
