"""multisql_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of MultiSQL (reference: /root/reference).

Architecture (SURVEY.md §7): a thin engine layer on top of Spark SQL /
DataFrame / Catalyst:

- :mod:`multisql_spark.session` — the ``Glue``-equivalent session object
  (reference ``src/glue/mod.rs:33-56``): named-database registry, session
  variables, ``execute(sql) -> Payload``.
- :mod:`multisql_spark.queries` — the declared query inventory (each entry
  has a Spark DataFrame builder and a DuckDB oracle SQL string).
- :mod:`multisql_spark.operators` — beyond-reference operators designed for
  100 TB scale: dedup (exact / minhash-LSH / simhash / jaccard), similarity
  search, text analysis, multimodal column plumbing.
- :mod:`multisql_spark.streaming` — Structured Streaming windowed operators
  over the ``events`` table.
"""

from multisql_spark.payload import Payload
from multisql_spark.session import (
    AlreadyExistsError,
    ColumnNotFoundError,
    EngineError,
    MultiSQLSession,
    NotNullViolation,
    TableNotFoundError,
    UniqueViolation,
    UnsupportedError,
)

__all__ = [
    "AlreadyExistsError",
    "ColumnNotFoundError",
    "EngineError",
    "MultiSQLSession",
    "NotNullViolation",
    "Payload",
    "TableNotFoundError",
    "UniqueViolation",
    "UnsupportedError",
]
__version__ = "0.1.0"
