"""Local mirror of the driver's correctness gate.

Runs every registered query through Spark AND its DuckDB oracle at a given
scale factor, comparing row count, sorted-column-name schema, and an order-
insensitive value hash — the same discipline the driver applies for
CORRECTNESS_r{N}.json. Run before every commit:

    python tools/check_oracle.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import sys
import time
from datetime import date, datetime

import duckdb

sys.path.insert(0, ".")

from retail_datalakehouse_spark import queries as Q  # noqa: E402
from retail_datalakehouse_spark.catalog import TESTDATA_TABLES  # noqa: E402
from retail_datalakehouse_spark.session import build_spark  # noqa: E402


def _norm(v):
    """Normalize a cell for hashing across engines."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        # Type-faithful: never collapse integral floats to ints. The driver's
        # hasher distinguishes int64 from float (r4 post-mortem: DuckDB HUGEINT
        # reached the driver as float and hash-failed while the old collapsing
        # _norm reported green locally). A float always renders with ".0" so an
        # int-vs-float column drift fails HERE, before a driver round is spent.
        if math.isnan(v):
            return "NaN"
        # FULL precision (repr = shortest round-trip), not %.6g: the r10 red
        # row x_update_mor_partitioned diverged by one cent in an 8-digit
        # revenue sum — invisible at 6 significant figures, red on the
        # driver's full-precision hasher (mirror blind spot #3). Any float
        # that differs in ANY bit must fail HERE, not on the driver.
        s = repr(v)
        if "." not in s and "e" not in s and "inf" not in s:
            s += ".0"
        return s
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


import re


def _frac_mults(expr: str) -> list[str]:
    """Fractional literals used as multipliers in ``expr`` (trailing-zero
    stripped decimals; '1.0' and '2.50' don't count as depth-adders beyond
    their real digits)."""
    out = []
    for m in re.finditer(r"[*]\s*(\d+\.\d+)|(\d+\.\d+)\s*[*]", expr):
        lit = m.group(1) or m.group(2)
        if lit.split(".", 1)[1].rstrip("0"):
            out.append(lit)
    return out


def guard_digit_lint(sql: str) -> list[str]:
    """Flag fractional-literal multipliers that FEED a low-scale DECIMAL
    cast — the r10 red-row class.

    A 2-decimal money column times a d-decimal literal is a (2+d)-decimal
    product; casting it to DECIMAL(25,S) with S < 2+d puts rows on the .xx5
    rounding boundary where Spark (BigDecimal HALF_UP on the double's
    shortest repr) and DuckDB (round of the true binary value) disagree
    (`271677.505 -> .51` vs `.50`). Guard digits fix it: scale >= 2+d makes
    the cast exact on both engines (helpers.py defaults scale=4).

    Direction matters: a fractional multiply DOWNSTREAM of the cast (e.g.
    an EWMA `0.3*rev + 0.7*ewma` over an already-cast-and-rounded sum) is
    identical IEEE double math on both engines — fine. So this flags a
    multiplier only when it (a) appears inside the cast's argument, or
    (b) defines an alias (`<expr with * 1.1> AS name`) that the cast's
    argument references — the red row's CTE shape.
    """
    worst: list[str] = []
    for m in re.finditer(r"\bAS\s+DECIMAL\(\s*\d+\s*,\s*(\d+)\s*\)\s*\)", sql, re.I):
        scale = int(m.group(1))
        if scale >= 6:  # davg-style scales have ample guard digits
            continue
        # walk BACKWARD from 'AS DECIMAL' to the CAST's opening paren to
        # extract the cast argument (handles nested parens)
        depth, i = 1, m.start() - 1
        while i >= 0 and depth > 0:
            if sql[i] == ")":
                depth += 1
            elif sql[i] == "(":
                depth -= 1
            i -= 1
        arg = sql[i + 2 : m.start()]
        feeders = _frac_mults(arg)
        # aliases the cast argument references, defined elsewhere with a
        # fractional multiply in the same select item (no intervening
        # comma/SELECT/FROM — the `... * 1.1 ... END AS name` CTE shape)
        for ident in set(re.findall(r"[A-Za-z_]\w*", arg)):
            for d in re.finditer(
                rf"[*]\s*(\d+\.\d+)(?:(?!,|\bSELECT\b|\bFROM\b).)*?\bAS\s+{ident}\b",
                sql,
                re.S | re.I,
            ):
                if d.group(1).split(".", 1)[1].rstrip("0"):
                    feeders.append(d.group(1))
        for lit in feeders:
            d = len(lit.split(".", 1)[1].rstrip("0"))
            if 2 + d > scale:
                worst.append(
                    f"* {lit} feeds CAST(... AS DECIMAL(_,{scale})): "
                    f"needs scale>={2 + d}"
                )
    return worst


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--timings",
        action="store_true",
        help="merge per-query wall times into tools/gate_costs.json "
        "(the rotation budget gen_query_index.py reports)",
    )
    ap.add_argument(
        "--vanilla",
        action="store_true",
        help="run under a bare driver-style session (local[32], shuffle=32, "
        "none of build_spark's tuned confs) — every new query must pass "
        "BOTH tuned and vanilla before registration",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    timings: dict[str, float] = {}

    if args.vanilla:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[32]")
            .appName("oracle-check-vanilla")
            .config("spark.sql.shuffle.partitions", "32")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.driver.memory", "16g")
            .getOrCreate()
        )
    else:
        spark = build_spark("oracle-check")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    registry = Q.all_queries()
    names = args.names or list(registry)
    n_pass = n_fail = n_rows_only = 0
    failures = []
    for name in names:
        q = registry[name]
        t0 = time.time()
        _done = lambda: timings.__setitem__(name, round(time.time() - t0, 2))  # noqa: B023,E731
        try:
            sdf = q.fn(spark, args.sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            failures.append(name)
            continue
        # Schema lint BEFORE hashing — and BEFORE the rows-only early-out:
        # the driver's canonicalizer sorts result columns with pandas, which
        # raises `TypeError: unhashable type: 'list'` on list cells (r5's red
        # row l4_inverted_index was SQL-oracle; r9's red row
        # x_approx_percentiles was rows-only — the lint used to sit after the
        # oracle-is-None continue, so rows-only queries were a blind spot the
        # driver found). EVERY registered query's output must be scalar
        # columns only; stringify arrays with concat_ws/array_join.
        # decimal joins the list (r4's HUGEINT class, Spark-side): the
        # driver renders Decimal cells differently than float/int even
        # when values agree — cast outputs to BIGINT/DOUBLE.
        complex_cols = [
            f"{fld.name}:{fld.dataType.simpleString()}"
            for fld in sdf.schema.fields
            if fld.dataType.typeName() in ("array", "map", "struct", "decimal")
        ]
        if complex_cols:
            print(f"FAIL  {name}: complex-type lint — driver hasher cannot "
                  f"canonicalize list cells; stringify: {', '.join(complex_cols)}")
            n_fail += 1
            failures.append(name)
            continue
        if q.oracle is None:
            _done()
            print(f"rows-only  {name}: {len(srows)} rows  ({time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        # Guard-digit lint (r10 red-row class): a fractional multiplier
        # anywhere in the oracle + a DECIMAL cast with too few guard digits
        # = cross-engine .xx5 rounding divergence. Text-level, zero-cost.
        gd = guard_digit_lint(q.oracle)
        if gd:
            print(f"FAIL  {name}: guard-digit lint — {'; '.join(gd)} "
                  f"(use dsum/sql_dsum default scale=4)")
            n_fail += 1
            failures.append(name)
            continue
        try:
            # Type lint BEFORE hashing: DuckDB widens SUM(BIGINT) to HUGEINT
            # (int128) and the driver renders HUGEINT/DECIMAL differently than
            # Spark's int64/double even when values agree (the r4 failure
            # class). Every integer aggregate in an oracle must be CAST to
            # BIGINT at the output; fail loudly here instead of on the driver.
            rel = con.sql(q.oracle)
            bad = [
                f"{c}:{t}"
                for c, t in zip(rel.columns, (str(t) for t in rel.types))
                if t in ("HUGEINT", "UHUGEINT") or t.startswith("DECIMAL")
            ]
            if bad:
                print(f"FAIL  {name}: oracle type lint — wrap in CAST(... AS "
                      f"BIGINT/DOUBLE): {', '.join(bad)}")
                n_fail += 1
                failures.append(name)
                continue
            res = con.execute(q.oracle)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            failures.append(name)
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"schema spark={sorted(scols)} duckdb={sorted(ocols)}")
        else:
            sh, oh = value_hash(scols, srows), value_hash(ocols, orows)
            if sh != oh:
                problems.append(f"hash spark={sh} duckdb={oh}")
                # show first differing rows to debug
                skey = sorted("|".join(_norm(r[i]) for i in sorted(range(len(scols)), key=lambda i: scols[i])) for r in srows)
                okey = sorted("|".join(_norm(r[i]) for i in sorted(range(len(ocols)), key=lambda i: ocols[i])) for r in orows)
                diff = [(a, b) for a, b in zip(skey, okey) if a != b][:3]
                for a, b in diff:
                    print(f"      spark : {a}\n      duckdb: {b}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            n_fail += 1
            failures.append(name)
        else:
            _done()
            print(f"PASS  {name}: {len(srows)} rows  ({time.time()-t0:.1f}s)")
            n_pass += 1
    if args.timings and timings:
        import json as _json
        import os as _os

        tp = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "gate_costs.json")
        merged = {}
        if _os.path.exists(tp):
            merged = _json.load(open(tp))
        merged.update(timings)
        with open(tp, "w") as f:
            _json.dump(dict(sorted(merged.items())), f, indent=1)
        print(f"timings merged into {tp} ({len(timings)} queries)")
    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail")
    if failures:
        print("failures:", " ".join(failures))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
