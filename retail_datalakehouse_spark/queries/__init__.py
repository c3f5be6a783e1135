"""Query registry package — importing this module populates the registry.

Each submodule registers its queries at import time via
:func:`retail_datalakehouse_spark.queries.base.register`.
"""

from __future__ import annotations

from .base import REGISTRY, Query, oracle_sql, queries, register  # noqa: F401

# Import order = registration order = the order the driver's (row-capped)
# correctness gate walks the registry. Round-3 rotation: the driver gate caps
# at ~50 rows and relational/windows/functions/udfs all earned green rows in
# r2, while T1-T9 have never had a driver row and the S/L code changed since
# its r1 rows. Register streaming, lakehouse, and llm FIRST so the gate's
# window finally lands on them; the already-driver-green blocks go last.
from . import streaming, lakehouse, llm, relational, windows, functions, udfs, extras, advanced, analytics  # noqa: E402,F401


def all_queries():
    return dict(REGISTRY)
