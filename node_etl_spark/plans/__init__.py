from .queries import QUERIES, Query, oracle_map, query_map

__all__ = ["QUERIES", "Query", "query_map", "oracle_map"]
