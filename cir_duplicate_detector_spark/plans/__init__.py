"""Query registry exposed through ``__spark_entry__``.

``ALL_QUERIES``: name -> (spark_callable(spark, sf_dir) -> DataFrame,
duckdb_oracle_sql | None).
"""

from __future__ import annotations

from .core_queries import CORE_QUERIES

ALL_QUERIES: dict[str, tuple] = {}
ALL_QUERIES.update(CORE_QUERIES)

try:  # extension registries appear as they are built
    from .extension_queries import EXTENSION_QUERIES

    ALL_QUERIES.update(EXTENSION_QUERIES)
except ImportError:
    pass
