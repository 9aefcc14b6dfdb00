from .registry import QUERIES, Query, get_queries, get_oracle_sql  # noqa: F401
