from .files import read_csv, read_json, read_parquet, load_sf_tables, SF_TABLES

__all__ = ["read_csv", "read_json", "read_parquet", "load_sf_tables", "SF_TABLES"]
