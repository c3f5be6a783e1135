"""Feature-detection for EXTERNAL table-format readers (VERDICT r13
item 8 / r12 item 7).

The exporters in ``table_format.py`` emit the PUBLIC on-disk protocols —
a Delta ``_delta_log`` (JSON actions, %020d commits) and an Iceberg v2
metadata tree (metadata.json → manifest list → manifests) — and this
repo ships its own stdlib importers (``delta_import.py`` /
``iceberg_import.py``) because the container has none of the external
binaries. When an environment DOES have delta-rs (``deltalake``),
``pyiceberg``, or DuckDB's ``delta`` extension, the exported layouts
should be verified by those independent third-party readers instead of
(in addition to) our own.

This module is the one place that knowledge lives: import-probe each
reader once, expose the result, and let tests/queries upgrade
automatically. Every probe is wrapped so a PARTIALLY installed package
(importable but unusable) degrades to "absent" rather than crashing the
suite.
"""

from __future__ import annotations

from functools import lru_cache


@lru_cache(maxsize=1)
def has_deltalake() -> bool:
    """delta-rs python bindings: ``DeltaTable(path)`` opens _delta_log."""
    try:
        from deltalake import DeltaTable  # noqa: F401

        return True
    except Exception:
        return False


@lru_cache(maxsize=1)
def has_pyiceberg() -> bool:
    """pyiceberg static tables: ``StaticTable.from_metadata(path)``."""
    try:
        from pyiceberg.table import StaticTable  # noqa: F401

        return True
    except Exception:
        return False


@lru_cache(maxsize=1)
def has_duckdb_delta() -> bool:
    """DuckDB's delta extension (``delta_scan``): needs the extension to
    be installable, which requires a network or a pre-bundled copy —
    probe by attempting LOAD, never by downloading."""
    try:
        import duckdb

        con = duckdb.connect()
        try:
            con.execute("LOAD delta")
            return True
        finally:
            con.close()
    except Exception:
        return False


def available_readers() -> dict[str, bool]:
    """One-call summary, used by tests and COVERAGE.md tooling."""
    return {
        "deltalake": has_deltalake(),
        "pyiceberg": has_pyiceberg(),
        "duckdb_delta": has_duckdb_delta(),
    }


def read_delta_with_deltalake(path: str):
    """Open an exported _delta_log with delta-rs and return a pandas
    DataFrame of the current snapshot. Caller must have checked
    ``has_deltalake()`` — raises ImportError otherwise (never silently
    falls back: the point of the external leg is independence)."""
    from deltalake import DeltaTable

    return DeltaTable(path).to_pandas()


def open_iceberg_with_pyiceberg(metadata_path: str):
    """Open an exported metadata.json with pyiceberg and return the
    StaticTable. Verification is METADATA-level (schema, snapshots,
    partition spec, current-snapshot-id): full scans need Avro manifest
    lists, and this repo's exporter serializes manifests as the
    documented JSON stand-in (no Avro tooling in the container), so a
    pyiceberg ``.scan()`` is expected to fail until the Avro writer
    exists. The metadata.json itself is spec-JSON and fully readable."""
    from pyiceberg.table import StaticTable

    return StaticTable.from_metadata(metadata_path)
