"""sparkflow — PySpark-native stream & batch analytics engine.

Capability-equivalent to the Flink stream-processing pattern catalog of
`minmay/flink-patterns` (see SURVEY.md §0: the reference tree is empty in
this environment, so parity targets are the public Flink DataStream/Table
API pattern vocabulary documented per-operator in docstrings), extended
with LLM-data-pipeline operators, built Spark-first on DataFrame/Catalyst/
AQE/Structured Streaming.

Importing this package populates ``registry.QUERIES`` / ``registry.ORACLES``.
"""

from __future__ import annotations

from . import catalog, oracle_compat, registry, session  # noqa: F401

# Operator modules register themselves on import.
from .functions import scalar, udfs  # noqa: F401
from .llm import dedup, multimodal, similarity, text  # noqa: F401
from .operators import aggregates, joins, projections, sort_set, windows  # noqa: F401
from .sources import io  # noqa: F401
from .streaming import analogs, stateful  # noqa: F401

QUERIES = registry.QUERIES
ORACLES = registry.ORACLES
