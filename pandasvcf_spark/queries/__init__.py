"""Declared query catalog — the oracle-checked surface of the engine.

Importing this package registers every catalog entry into
`pandasvcf_spark.queries.QUERIES` (name → QuerySpec). `__spark_entry__.py`
exposes the same catalog through the driver contract.
"""

from pandasvcf_spark.queries.registry import QUERIES, QuerySpec, register  # noqa: F401

# Import order is alphabetical; each module registers its entries on import.
from pandasvcf_spark.queries import (  # noqa: F401,E402
    events_q,
    genomics_q,
    relational_q,
    text_q,
    vectors_q,
)

__all__ = ["QUERIES", "QuerySpec", "register"]
