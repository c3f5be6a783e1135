"""Query registry package — importing this module populates the registry.

Each submodule registers its queries at import time via
:func:`retail_datalakehouse_spark.queries.base.register`.
"""

from __future__ import annotations

from .base import REGISTRY, Query, oracle_sql, queries, register  # noqa: F401

# Import order = registration order = the order the driver's (time-bounded)
# correctness gate walks the registry. Cheap relational/window/function/udf
# queries register first; the expensive streaming + LLM blocks last, so a
# budget cut never costs a cheap query its driver row.
from . import relational, windows, functions, udfs, extras, advanced, analytics, lakehouse, llm, streaming  # noqa: E402,F401


def all_queries():
    return dict(REGISTRY)
