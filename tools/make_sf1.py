"""Generate an sf1 (~10x sf0.1) rehearsal dataset under /root/repo/.sf1/.

Scale-up rule: REPLICATE sf0.1 ten times with per-domain key strides so
every foreign-key relationship holds inside each replica (replica i's
orders point at replica i's customers, etc.). Non-key attributes are
copied verbatim, so value distributions (dates, prices, segments, text)
match sf0.1 exactly while row counts, join fan-outs, group counts and
shuffle volumes grow 10x — the axis a scale rehearsal measures.

documents/embeddings are replicated byte-identical under shifted ids:
that makes each document a member of a 10-clone exact-dup group and each
vector a 10-way cosine tie, which is a *harder* near-dup/ANN workload
than organic growth (denser LSH buckets, bigger components) — a
conservative stress, noted in SCALE.md.

region/nation stay fixed (TPC-H holds them constant across SF).

DuckDB writes the parquet (single file per table, zstd), ~6M lineitem
rows total; `catalog.load_table` normalizes its TIMESTAMP(MICROS)
encoding the same way it does the driver's TIMESTAMP(NANOS).
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".sf1")
REPLICAS = 10

# one stride per key domain, far above every sf0.1 max
K_USER = 1_000_000  # customer keys / events.user_id
K_SUPP = 1_000_000
K_PART = 1_000_000
K_ORDER = 10_000_000
K_EVENT = 10_000_000
K_DOC = 1_000_000
K_VEC = 1_000_000

TABLES = {
    "region": "SELECT * FROM src",
    "nation": "SELECT * FROM src",
    "customer": f"""SELECT c_custkey + i*{K_USER} AS c_custkey, c_name, c_nationkey,
                           c_acctbal, c_mktsegment FROM src, r""",
    "supplier": f"""SELECT s_suppkey + i*{K_SUPP} AS s_suppkey, s_name, s_nationkey,
                           s_acctbal FROM src, r""",
    "part": f"""SELECT p_partkey + i*{K_PART} AS p_partkey, p_name, p_brand, p_type,
                       p_size, p_retailprice FROM src, r""",
    "orders": f"""SELECT o_orderkey + i*{K_ORDER} AS o_orderkey,
                         o_custkey + i*{K_USER} AS o_custkey,
                         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
                  FROM src, r""",
    "lineitem": f"""SELECT l_orderkey + i*{K_ORDER} AS l_orderkey,
                           l_partkey + i*{K_PART} AS l_partkey,
                           l_suppkey + i*{K_SUPP} AS l_suppkey,
                           l_linenumber, l_quantity, l_extendedprice, l_discount,
                           l_tax, l_returnflag, l_linestatus, l_shipdate
                    FROM src, r""",
    "events": f"""SELECT event_id + i*{K_EVENT} AS event_id, ts,
                         user_id + i*{K_USER} AS user_id, event_type, value, props
                  FROM src, r""",
    "documents": f"""SELECT doc_id + i*{K_DOC} AS doc_id, text, lang, source, n_chars
                     FROM src, r""",
    "embeddings": f"""SELECT vec_id + i*{K_VEC} AS vec_id, embedding, label
                      FROM src, r""",
}


HASHES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "sf1_hashes.json")


def table_hashes() -> dict[str, dict]:
    """Per-table (row count, order-insensitive content hash) of the
    generated sf1 set — the replication SQL is deterministic, so these
    are reproducible constants any re-run must hit."""
    import json

    con = duckdb.connect()
    out: dict[str, dict] = {}
    for name in TABLES:
        p = os.path.join(DST, f"{name}.parquet")
        n, h = con.sql(
            f"SELECT COUNT(*), bit_xor(hash(t::VARCHAR)) FROM '{p}' t"
        ).fetchone()
        out[name] = {"rows": int(n), "xor_hash": str(h)}
    return out


def verify_hashes() -> dict[str, bool]:
    """Compare the on-disk sf1 set against the checked-in manifest
    (tools/sf1_hashes.json). First generation WRITES the manifest; every
    later run — builder, driver, or judge — verifies against it, making
    the 10x rehearsal a one-command reproducible artifact."""
    import json

    got = table_hashes()
    if not os.path.exists(HASHES):
        with open(HASHES, "w") as fh:
            json.dump(got, fh, indent=1, sort_keys=True)
        print(f"wrote manifest {HASHES}")
        return {t: True for t in got}
    with open(HASHES) as fh:
        want = json.load(fh)
    report = {t: got.get(t) == want.get(t) for t in want}
    for t, ok in report.items():
        if not ok:
            print(f"MISMATCH {t}: want {want.get(t)} got {got.get(t)}")
    return report


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW r AS SELECT range AS i FROM range({REPLICAS})")
    for name, sql in TABLES.items():
        out = os.path.join(DST, f"{name}.parquet")
        if os.path.exists(out):
            print(f"skip {name} (exists)")
            continue
        con.sql(f"CREATE OR REPLACE VIEW src AS SELECT * FROM '{SRC}/{name}.parquet'")
        con.sql(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET, COMPRESSION ZSTD)")
        n = con.sql(f"SELECT COUNT(*) FROM '{out}'").fetchone()[0]
        print(f"wrote {name}: {n} rows")


if __name__ == "__main__":
    main()
    report = verify_hashes()
    sys.exit(0 if all(report.values()) else 1)
