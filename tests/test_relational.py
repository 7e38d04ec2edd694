"""Relational operators: result sanity + the join-strategy/pushdown
properties that matter at scale (values are oracle-checked by the driver
gate / tools/check_oracles.py)."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _tables(spark):
    return {
        t: spark.read.parquet(f"{SF}/{t}.parquet")
        for t in ["lineitem", "orders", "customer", "nation", "region", "part"]
    }


def test_region_revenue_broadcasts_all_dimensions(spark):
    from simages_spark.relational import region_revenue

    t = _tables(spark)
    df = region_revenue(
        t["lineitem"], t["orders"], t["customer"], t["nation"], t["region"]
    )
    plan = _plan(df)
    # customer, nation, region all broadcast; the fact chain never does
    assert plan.count("BroadcastHashJoin") >= 3
    rows = {(r["r_name"], r["n_name"]) for r in df.collect()}
    assert len(rows) > 0


def test_pricing_summary_pushdown_and_groups(spark):
    from pyspark.sql import functions as F

    from simages_spark.relational import pricing_summary

    t = _tables(spark)
    df = pricing_summary(t["lineitem"])
    plan = _plan(df)
    # the shipdate predicate reaches the parquet scan...
    assert "PushedFilters" in plan and "l_shipdate" in plan.split(
        "PushedFilters"
    )[1][:200]
    # ...and unused columns are pruned from the read schema
    read_schema = plan.split("ReadSchema")[1].split("\n")[0]
    assert "l_comment" not in read_schema and "l_partkey" not in read_schema
    got = df.collect()
    assert {(r["l_returnflag"], r["l_linestatus"]) for r in got} <= {
        (a, b) for a in "ANR" for b in "FO"
    }
    # exact-decimal sums: totals must reconcile with a direct count
    n = t["lineitem"].where(
        F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp")
    ).count()
    assert sum(r["count_order"] for r in got) == n


def test_top_customers_take_ordered(spark):
    from simages_spark.relational import top_customers

    t = _tables(spark)
    df = top_customers(t["orders"], t["customer"], t["nation"], k=5)
    # global top-k compiles to TakeOrderedAndProject, not a full sort
    assert "TakeOrderedAndProject" in _plan(df)
    got = df.collect()
    assert len(got) == 5
    spents = [r["total_spent"] for r in got]
    assert spents == sorted(spents, reverse=True)


def test_customer_order_ranks_no_global_sort(spark):
    from simages_spark.relational import customer_order_ranks

    t = _tables(spark)
    df = customer_order_ranks(t["orders"], top_n=2)
    plan = _plan(df)
    # keyed window: every Sort in the plan is per-partition (global=false)
    assert "Sort [" not in plan or "true], [" not in plan.split("Sort [")[1][:120]
    per_cust = {}
    for r in df.collect():
        per_cust.setdefault(r["custkey"], []).append(r)
    assert all(len(v) <= 2 for v in per_cust.values())
    for rows in per_cust.values():
        rows.sort(key=lambda r: r["rnk"])
        prices = [r["totalprice"] for r in rows]
        assert prices == sorted(prices, reverse=True)
