from .registry import all_queries, all_oracles  # noqa: F401
