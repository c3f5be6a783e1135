"""Time-series downsampling operators.

M4 (first/min/max/last per bucket) is pure associative aggregation and
lives inline in its query (``x_m4_downsample``). LTTB — Largest Triangle
Three Buckets (Steinarsson 2013, the Grafana/InfluxDB `sample` default) —
is the perceptually-better alternative, but each bucket's chosen point
depends on the PREVIOUSLY chosen point, so it cannot be an aggregation:
it is the canonical "sequential per key" operator. Spark shape:
``applyInPandas`` per series — each series' walk is a single in-memory
pass (series length = days, not facts), and all series run in parallel.

Cross-engine determinism contract (the unrolled-CTE oracle in
``queries/analytics.py`` mirrors it op for op):
- y enters as INTEGER cents; every float derives as ``cents / 100.0``.
- bucket averages divide exact integer sums: ``(Σcents / 100.0) / k``
  and ``Σx / k`` — never a float accumulation.
- the triangle area is the literal expression
  ``abs((ax - nx)*(by - ay) - (ax - bx)*(ny - ay))`` — identical IEEE
  ops on identical doubles on both engines.
- ties on area pick the EARLIEST x (strict ``>`` keeps the first max).
"""

from __future__ import annotations

import pandas as pd


def lttb_pandas(pdf: pd.DataFrame, x_col: str, cents_col: str, buckets: int) -> pd.DataFrame:
    """LTTB over one series (rows of one key), returning the selected
    points with their 0-based ``sel_idx``. ``buckets`` counts TOTAL
    output points (first + middle + last). Series shorter than
    ``buckets`` return whole (no downsampling needed)."""
    pdf = pdf.sort_values(x_col).reset_index(drop=True)
    n = len(pdf)
    xs = [int(v) for v in pdf[x_col]]
    cents = [int(v) for v in pdf[cents_col]]
    if n <= buckets:
        out = pdf.copy()
        out["sel_idx"] = range(n)
        return out
    B = buckets - 2  # middle buckets
    # 0-based middle indices 1..n-2; index i lands in bucket (i-1)*B // (n-2)
    members: list[list[int]] = [[] for _ in range(B)]
    for i in range(1, n - 1):
        members[(i - 1) * B // (n - 2)].append(i)
    sel = [0]
    prev = 0
    for b in range(B):
        if b < B - 1:
            nxt = members[b + 1]
            k = len(nxt)
            nx = sum(xs[i] for i in nxt) / k
            ny = (sum(cents[i] for i in nxt) / 100.0) / k
        else:
            nx = float(xs[n - 1])
            ny = cents[n - 1] / 100.0
        ax = float(xs[prev])
        ay = cents[prev] / 100.0
        best, best_area = None, -1.0
        for i in members[b]:
            bx = float(xs[i])
            by = cents[i] / 100.0
            area = abs((ax - nx) * (by - ay) - (ax - bx) * (ny - ay))
            if area > best_area:  # strict: first max = earliest x wins ties
                best_area, best = area, i
        sel.append(best)
        prev = best
    sel.append(n - 1)
    out = pdf.iloc[sel].copy()
    out["sel_idx"] = range(len(sel))
    return out
