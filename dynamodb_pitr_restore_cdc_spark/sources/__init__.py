from .fixtures import TABLES, table

__all__ = ["TABLES", "table"]
