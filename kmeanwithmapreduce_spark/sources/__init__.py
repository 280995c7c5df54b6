from .readers import TABLES, load_points_csv, load_table, load_tables, register_views

__all__ = ["TABLES", "load_points_csv", "load_table", "load_tables", "register_views"]
