"""Feature-detected external table-format reader legs (VERDICT r13 item
8): when delta-rs / pyiceberg are present, the exported layouts are
verified by the INDEPENDENT third-party reader; when absent (this
container), the probe itself is still exercised and the legs skip with
the probe's verdict visible in the skip reason."""

import tempfile

import pytest

from retail_datalakehouse_spark.sources.format_probe import (
    available_readers,
    has_deltalake,
    has_duckdb_delta,
    has_pyiceberg,
    open_iceberg_with_pyiceberg,
    read_delta_with_deltalake,
)
from retail_datalakehouse_spark.sources.table_format import VersionedTable


def test_probe_shape_and_stability():
    r = available_readers()
    assert set(r) == {"deltalake", "pyiceberg", "duckdb_delta"}
    assert all(isinstance(v, bool) for v in r.values())
    # probes are cached: a second call is the same dict values
    assert available_readers() == r


def _export_both(spark):
    root = tempfile.mkdtemp(prefix="rdl_probe_")
    t = VersionedTable(spark, root)
    t.overwrite(
        spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, v string")
    )
    delta_root = t.export_delta_log()
    meta_path = t.export_iceberg_metadata()
    return root, delta_root, meta_path


@pytest.mark.skipif(not has_deltalake(), reason="delta-rs not installed")
def test_deltalake_reads_exported_log(spark):
    root, _, _ = _export_both(spark)
    pdf = read_delta_with_deltalake(root)
    assert sorted(zip(pdf["k"], pdf["v"])) == [(1, "a"), (2, "b"), (3, "c")]


@pytest.mark.skipif(not has_pyiceberg(), reason="pyiceberg not installed")
def test_pyiceberg_opens_exported_metadata(spark):
    import json
    import os

    root, _, _ = _export_both(spark)
    hint = open(os.path.join(root, "metadata", "version-hint.text")).read().strip()
    meta = os.path.join(root, "metadata", f"v{hint}.metadata.json")
    table = open_iceberg_with_pyiceberg(meta)
    ours = json.load(open(meta))
    assert table.metadata.current_snapshot_id == ours["current-snapshot-id"]
    assert {f.name for f in table.schema().fields} == {"k", "v"}


@pytest.mark.skipif(not has_duckdb_delta(), reason="duckdb delta extension absent")
def test_duckdb_delta_scans_exported_log(spark):
    import duckdb

    root, _, _ = _export_both(spark)
    con = duckdb.connect()
    con.execute("LOAD delta")
    rows = con.execute(
        f"SELECT k, v FROM delta_scan('{root}') ORDER BY k"
    ).fetchall()
    assert rows == [(1, "a"), (2, "b"), (3, "c")]
