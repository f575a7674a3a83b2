from .guard import is_read_only_sql, assert_read_only

__all__ = ["is_read_only_sql", "assert_read_only"]
