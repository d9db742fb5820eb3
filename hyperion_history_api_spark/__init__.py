"""PySpark-native analytics engine with the query/data-processing
capabilities of eosrio/hyperion-history-api (reference: /root/reference,
v4.0.7).

Hyperion is a log-analytics system: an append-only history log
(actions/deltas/blocks) plus mutable current state, queried through an
HTTP API whose operators are Elasticsearch bool-query/aggregation
constructions. This package re-expresses both halves Spark-first:

- ``plans``      — query-param -> Column predicate compiler (SURVEY §2.2/§2.6)
- ``operators``  — latest-state windows, as-of joins, regrouping, dedup,
                   similarity search (SURVEY §2.3-§2.5, beyond-reference ops)
- ``functions``  — scalar/text functions (SURVEY §2.8, text analysis)
- ``api``        — endpoint-shaped queries (SURVEY §2.11)
- ``sources``    — lake layout: partitioned write/read (SURVEY §1.3, §2.1)
- ``streaming``  — Structured Streaming ingest + live filter compiler (§2.9)
- ``registry``   — every query paired with its DuckDB oracle SQL (the
                   correctness matrix consumed by ``__spark_entry__.py``)
"""

__version__ = "0.1.0"
