"""Query registry package — importing this module populates the registry.

Each submodule registers its queries at import time via
:func:`retail_datalakehouse_spark.queries.base.register`.
"""

from __future__ import annotations

from .base import REGISTRY, Query, oracle_sql, queries, register  # noqa: F401

# Import order mirrors the SURVEY §7 build plan; each import registers rows.
from . import extras, functions, lakehouse, llm, relational, streaming, udfs, windows  # noqa: E402,F401  (S4, P1-P4, J1-J8, A1-A6, O1-O4) + (W1-W6, J9)


def all_queries():
    return dict(REGISTRY)
