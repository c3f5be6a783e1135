"""Golden end-to-end test (SURVEY §5.4): medallion raw→bronze→silver→gold
over reference-SHAPED mini CSVs (synthesized here — same schemas, same
dirty-data traits: duplicate re-ingest, correction file, broken FK, NULLs).
"""

from __future__ import annotations

import pytest

from retail_datalakehouse_spark.plans.medallion import MedallionPipeline


@pytest.fixture()
def raw_zone(tmp_path):
    orders_dir = tmp_path / "raw" / "orders"
    items_dir = tmp_path / "raw" / "items"
    orders_dir.mkdir(parents=True)
    items_dir.mkdir(parents=True)

    header_o = "order_num,order_id,user_id,order_timestamp,total_amount,date\n"
    (orders_dir / "orders_2024-06-06.csv").write_text(
        header_o
        + "1,101,7,2024-06-06 10:00:00,5.00,2024-06-06\n"
        + "2,102,7,2024-06-06 11:00:00,20.52,2024-06-06\n"
        + "3,103,8,2024-06-06 12:00:00,15.00,2024-06-06\n"
        + "3,103,8,2024-06-06 12:00:00,15.00,2024-06-06\n"  # exact dup row (re-ingest)
    )
    (orders_dir / "orders_2024-06-07.csv").write_text(
        header_o
        + "4,104,7,2024-06-07 09:00:00,30.00,2024-06-07\n"
        + "5,105,9,2024-06-07 10:30:00,8.00,2024-06-07\n"
    )
    # correction file: order 101 5.00 -> 25.00, order 102 20.52 -> 120.52
    corr = tmp_path / "orders_2024-06-06-Updated.csv"
    corr.write_text(
        header_o
        + "1,101,7,2024-06-06 10:00:00,25.00,2024-06-06\n"
        + "2,102,7,2024-06-06 11:00:00,120.52,2024-06-06\n"
    )

    header_i = (
        "id,order_id,user_id,days_since_prior_order,product_id,add_to_cart_order,"
        "reordered,order_timestamp,date\n"
    )
    (items_dir / "order_items_2024-06-06.csv").write_text(
        header_i
        + "1,101,7,,4,1,0,2024-06-06 10:00:00,2024-06-06\n"  # NULL days_since
        + "2,101,7,3.0,999,2,1,2024-06-06 10:00:00,2024-06-06\n"  # broken FK (999)
        + "3,102,7,1.0,7,1,1,2024-06-06 11:00:00,2024-06-06\n"
    )
    (items_dir / "order_items_2024-06-07.csv").write_text(
        header_i + "4,104,7,1.0,4,1,1,2024-06-07 09:00:00,2024-06-07\n"
    )

    products = tmp_path / "products.csv"
    # reference-shaped: 4-name header over 5-field rows
    products.write_text(
        "product_id,department_id,department,product_name\n"
        "4,83,4,produce,fresh vegetables\n"
        "7,12,2,bakery,sour dough bread\n"
    )
    return {
        "orders": str(orders_dir),
        "items": str(items_dir),
        "products": str(products),
        "corrections": str(corr),
    }


def test_medallion_end_to_end_golden(spark, raw_zone, tmp_path):
    pipe = MedallionPipeline(spark, str(tmp_path / "lake"))
    out = pipe.run(
        raw_zone["orders"], raw_zone["items"], raw_zone["products"],
        corrections_csv=raw_zone["corrections"], write=True,
    )

    # bronze: typed + deduped (the duplicated 103 row collapsed)
    assert out["bronze_orders"].count() == 5
    # silver: corrections merged (101: 25.00, 102: 120.52)
    silver = {r.order_id: r.total_amount for r in out["silver_orders"].collect()}
    assert silver[101] == 25.00 and silver[102] == 120.52 and silver[103] == 15.00

    # gold daily revenue — golden values
    daily = {str(r.date): (r.revenue, r.n_orders, r.n_users)
             for r in out["gold_daily_revenue"].collect()}
    # engine sums in exact decimal → 160.52, unlike naive float addition
    assert daily["2024-06-06"] == (160.52, 3, 2)
    assert daily["2024-06-07"] == (38.00, 2, 2)

    # gold department sales — broken-FK line kept under UNKNOWN (left join)
    dept = {r.department: (r.n_lines, r.n_reorders)
            for r in out["gold_department_sales"].collect()}
    assert dept["produce"] == (2, 1)
    assert dept["bakery"] == (1, 1)
    assert dept["UNKNOWN"] == (1, 1)  # product_id 999 has no dim row

    # gold repeat customers: user 7 has 3 orders
    repeat = {r.user_id: r.n_orders for r in out["gold_repeat_customers"].collect()}
    assert repeat == {7: 3}

    # persisted zones are date-partitioned parquet
    import os

    assert os.path.isdir(str(tmp_path / "lake" / "silver" / "orders" / "date=2024-06-06"))


def test_medallion_reingest_idempotent(spark, raw_zone, tmp_path):
    """Running bronze over the same files twice changes nothing (the
    idempotency contract, `s3_bucket.py:33-37` generalized)."""
    pipe = MedallionPipeline(spark, str(tmp_path / "lake"))
    b1 = pipe.bronze_orders(raw_zone["orders"])
    b2 = pipe.bronze_orders(raw_zone["orders"])
    assert sorted(map(tuple, b1.collect())) == sorted(map(tuple, b2.collect()))


def test_medallion_correction_merge_idempotent(spark, raw_zone, tmp_path):
    """Applying the same correction file twice ≡ once (SURVEY §5.5)."""
    from retail_datalakehouse_spark import schemas
    from retail_datalakehouse_spark.sources.csv import read_csv_explicit

    pipe = MedallionPipeline(spark, str(tmp_path / "lake"))
    bronze = pipe.bronze_orders(raw_zone["orders"])
    corr = read_csv_explicit(spark, raw_zone["corrections"], schemas.ORDERS)
    once = pipe.silver_orders(bronze, corr)
    twice = pipe.silver_orders(once, corr)
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
