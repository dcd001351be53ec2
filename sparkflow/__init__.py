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
from .operators import joins  # noqa: F401

try:  # modules added incrementally; keep package importable mid-build
    from .operators import projections  # noqa: F401
    from .operators import aggregates  # noqa: F401
    from .operators import windows  # noqa: F401
    from .operators import sort_set  # noqa: F401
    from .functions import scalar  # noqa: F401
    from .functions import udfs  # noqa: F401
    from .sources import io  # noqa: F401
    from .streaming import analogs  # noqa: F401
    from .streaming import stateful  # noqa: F401
    from .llm import dedup  # noqa: F401
    from .llm import similarity  # noqa: F401
    from .llm import text  # noqa: F401
except ImportError:  # pragma: no cover - during scaffolding only
    pass

QUERIES = registry.QUERIES
ORACLES = registry.ORACLES
