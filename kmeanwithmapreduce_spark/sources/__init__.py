from .readers import (
    TABLES,
    ensure_min_parallelism,
    ensure_session_conf,
    load_points_csv,
    load_table,
    load_tables,
    register_views,
)

__all__ = [
    "TABLES",
    "ensure_min_parallelism",
    "ensure_session_conf",
    "load_points_csv",
    "load_table",
    "load_tables",
    "register_views",
]
