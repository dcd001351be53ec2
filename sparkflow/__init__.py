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

# Operator modules register themselves on import. ORDER MATTERS: the
# driver's correctness harness walks queries() in registration order under
# a budget, so the cheap spec-core relational/window/streaming operators
# register first and the expensive LLM pipeline operators register last —
# that way a truncated run still attests the SURVEY §2 core.
from .operators import projections  # noqa: F401  (§2.2 projection/filter)
from .operators import joins  # noqa: F401  (§2.3 joins)
from .operators import aggregates  # noqa: F401  (§2.4 aggregations)
from .operators import windows  # noqa: F401  (§2.5 window functions)
from .operators import sort_set  # noqa: F401  (§2.6 sort/limit, §2.7 set ops)
from .operators import sql_surface  # noqa: F401  (spark.sql API surface)
from .sources import io  # noqa: F401  (§2.1 sources & sinks)
from .streaming import analogs, stateful  # noqa: F401  (§2.9 streaming)
from .functions import scalar  # noqa: F401  (§2.8 scalar functions)
from .functions import udfs  # noqa: F401  (§2.10 UDF surface)
from .operators import graph  # noqa: F401  (iterative graph analytics — joins-heavy)
from .sources import custom  # noqa: F401  (Python DataSource connector — python-worker heavy)
from .llm import text  # noqa: F401  (§2.11 LLM ops — cheap text first)
from .llm import sampling  # noqa: F401  (split/sample/scrub — projection-cheap)
from .llm import curation  # noqa: F401  (quality rules / repetition / decontam)
from .llm import prep  # noqa: F401  (chunking / mixing / quantize / packing)
from .llm import dedup, multimodal, similarity  # noqa: F401  (heavy LLM last)

QUERIES = registry.QUERIES
ORACLES = registry.ORACLES
