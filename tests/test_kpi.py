"""KPI views: agg-then-join equals the reference's naive
join-then-COUNT-DISTINCT shape; edge cases (zero clicks / zero
impressions / zero campaigns) pinned; DuckDB oracle for campaign_ctr."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from spark_cdc.operators import kpi
from spark_cdc.sources.changelog import generate_adtech
from tests.conftest import assert_df_equal


def _fixture(spark):
    return generate_adtech(
        spark, n_advertisers=4, campaigns_per_adv=3, impressions_per_campaign=200, seed=42
    )


def test_campaign_ctr_equals_naive(spark):
    d = _fixture(spark)
    fast = kpi.campaign_ctr(d["advertiser"], d["campaign"], d["impressions"], d["clicks"])
    naive = kpi.campaign_ctr_naive(d["advertiser"], d["campaign"], d["impressions"], d["clicks"])
    assert_df_equal(fast, naive, ["campaign_id"])


def test_campaign_ctr_matches_duckdb(spark):
    d = _fixture(spark)
    got = kpi.campaign_ctr(d["advertiser"], d["campaign"], d["impressions"], d["clicks"])
    con = duckdb.connect()
    for name in ("advertiser", "campaign", "impressions", "clicks"):
        con.register(name, d[name].toPandas())
    want = con.execute(
        """
        WITH imp AS (SELECT campaign_id, count(DISTINCT id) impressions FROM impressions GROUP BY 1),
             clk AS (SELECT campaign_id, count(DISTINCT id) clicks FROM clicks GROUP BY 1)
        SELECT c.id campaign_id, c.name campaign_name, a.name advertiser_name,
               coalesce(imp.impressions, 0) impressions, coalesce(clk.clicks, 0) clicks,
               CASE WHEN coalesce(imp.impressions,0)=0 THEN NULL
                    ELSE coalesce(clk.clicks,0)::DOUBLE / imp.impressions END ctr
        FROM campaign c JOIN advertiser a ON c.advertiser_id=a.id
        LEFT JOIN imp ON imp.campaign_id=c.id LEFT JOIN clk ON clk.campaign_id=c.id
        ORDER BY campaign_id
        """
    ).fetchall()
    got_rows = [
        (r["campaign_id"], r["campaign_name"], r["advertiser_name"], r["impressions"], r["clicks"],
         None if r["ctr"] is None else round(r["ctr"], 9))
        for r in got.orderBy("campaign_id").collect()
    ]
    want_rows = [
        (cid, cn, an, i, c, None if ctr is None else round(ctr, 9))
        for cid, cn, an, i, c, ctr in want
    ]
    assert got_rows == want_rows


def test_edge_cases(spark):
    d = _fixture(spark)
    n_campaigns = 9  # (4-1)*3
    eff = kpi.campaign_efficiency(d["campaign"], d["impressions"], d["clicks"]).collect()
    by_id = {r["campaign_id"]: r for r in eff}
    # last campaign: zero impressions → ctr/cpc null paths
    assert by_id[n_campaigns]["impressions"] == 0
    assert by_id[n_campaigns]["cost_per_click"] is None
    # second-to-last campaign: impressions but zero clicks → NULLIF path
    assert by_id[n_campaigns - 1]["impressions"] > 0
    assert by_id[n_campaigns - 1]["clicks"] == 0
    assert by_id[n_campaigns - 1]["cost_per_click"] is None

    ap = kpi.advertiser_performance(
        d["advertiser"], d["campaign"], d["impressions"], d["clicks"]
    ).collect()
    by_adv = {r["advertiser_id"]: r for r in ap}
    # advertiser 4 has zero campaigns (left-join null path)
    assert by_adv[4]["campaign_count"] == 0 and by_adv[4]["ctr"] is None

    daily = kpi.daily_performance(d["impressions"], d["clicks"])
    months = daily.select(F.date_format("event_date", "yyyy-MM").alias("m")).distinct().count()
    assert months >= 2  # impressions span two calendar months


def test_campaign_daily_consistency(spark):
    d = _fixture(spark)
    cd = kpi.campaign_daily_performance(d["campaign"], d["impressions"], d["clicks"])
    total_from_daily = cd.agg(F.sum("impressions")).collect()[0][0]
    assert total_from_daily == d["impressions"].count()
