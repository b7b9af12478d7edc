"""The five KPI views (SURVEY.md §2.6) as Spark DataFrame plans.

Reference: ClickHouse SummingMergeTree materialized views
(/root/reference/etl/clickhouse_schema/kpi_views.sql). Differences,
deliberate and documented:

- **agg-then-join, not join-then-COUNT-DISTINCT.** The reference joins
  both facts to the dims and rescues the row explosion with
  ``COUNT(DISTINCT id)`` (kpi_views.sql:23-27 — see SURVEY.md §2.4).
  We aggregate each fact table *first* (map-side-combinable counts,
  no fact×fact blow-up), then join the small per-key aggregates —
  same result, proven equal in tests against the naive form, and the
  only shape that survives 100 TB facts.
- **Ratios recomputed from summed counts**, never summed themselves —
  the reference's SummingMergeTree summed ``ctr`` across merges,
  which is mathematically wrong (SURVEY.md §4 trap 1).
- **Division semantics pinned**: ``try_divide`` → null on zero
  denominators (ClickHouse yields nan/inf; the oracle SQL is written
  to match null).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fact_daily_counts(fact: DataFrame, id_col: str, alias: str) -> DataFrame:
    """Per (campaign_id, event_date) distinct-id count — aggregates the
    fact before any join."""
    return (
        fact.withColumn("event_date", F.to_date("created_at"))
        .groupBy("campaign_id", "event_date")
        .agg(F.countDistinct(id_col).alias(alias))
    )


def campaign_ctr(
    advertiser: DataFrame, campaign: DataFrame, impressions: DataFrame, clicks: DataFrame
) -> DataFrame:
    """mv_campaign_ctr (kpi_views.sql:4-27): per-campaign impressions,
    clicks, ctr, with advertiser name."""
    imp = impressions.groupBy("campaign_id").agg(F.countDistinct("id").alias("impressions"))
    clk = clicks.groupBy("campaign_id").agg(F.countDistinct("id").alias("clicks"))
    return (
        campaign.select(F.col("id").alias("campaign_id"), F.col("name").alias("campaign_name"), "advertiser_id")
        .join(F.broadcast(advertiser.select(F.col("id").alias("advertiser_id"), F.col("name").alias("advertiser_name"))), "advertiser_id")
        .join(imp, "campaign_id", "left")
        .join(clk, "campaign_id", "left")
        .select(
            "campaign_id",
            "campaign_name",
            "advertiser_name",
            F.coalesce("impressions", F.lit(0)).alias("impressions"),
            F.coalesce("clicks", F.lit(0)).alias("clicks"),
            F.try_divide(F.coalesce("clicks", F.lit(0)), F.coalesce("impressions", F.lit(0))).alias("ctr"),
        )
    )


def daily_performance(impressions: DataFrame, clicks: DataFrame) -> DataFrame:
    """mv_daily_performance (kpi_views.sql:30-47): per-date counts +
    daily ctr. (The reference's date-only join cross product is
    avoided entirely — SURVEY.md §4 trap 2.)"""
    imp = (
        impressions.withColumn("event_date", F.to_date("created_at"))
        .groupBy("event_date")
        .agg(F.countDistinct("id").alias("impressions"))
    )
    clk = (
        clicks.withColumn("event_date", F.to_date("created_at"))
        .groupBy("event_date")
        .agg(F.countDistinct("id").alias("clicks"))
    )
    return imp.join(clk, "event_date", "left").select(
        "event_date",
        "impressions",
        F.coalesce("clicks", F.lit(0)).alias("clicks"),
        F.try_divide(F.coalesce("clicks", F.lit(0)), "impressions").alias("daily_ctr"),
    )


def campaign_daily_performance(
    campaign: DataFrame, impressions: DataFrame, clicks: DataFrame
) -> DataFrame:
    """mv_campaign_daily_performance (kpi_views.sql:50-75)."""
    imp = _fact_daily_counts(impressions, "id", "impressions")
    clk = _fact_daily_counts(clicks, "id", "clicks")
    return (
        imp.join(clk, ["campaign_id", "event_date"], "left")
        .join(
            F.broadcast(campaign.select(F.col("id").alias("campaign_id"), F.col("name").alias("campaign_name"))),
            "campaign_id",
        )
        .select(
            "event_date",
            "campaign_id",
            "campaign_name",
            "impressions",
            F.coalesce("clicks", F.lit(0)).alias("clicks"),
            F.try_divide(F.coalesce("clicks", F.lit(0)), "impressions").alias("ctr"),
        )
    )


def campaign_efficiency(campaign: DataFrame, impressions: DataFrame, clicks: DataFrame) -> DataFrame:
    """mv_campaign_efficiency (kpi_views.sql:78-100):
    ``bid * impressions / NULLIF(clicks, 0)`` cost-per-click proxy."""
    imp = impressions.groupBy("campaign_id").agg(F.countDistinct("id").alias("impressions"))
    clk = clicks.groupBy("campaign_id").agg(F.countDistinct("id").alias("clicks"))
    return (
        campaign.select(
            F.col("id").alias("campaign_id"), F.col("name").alias("campaign_name"), "bid", "budget"
        )
        .join(imp, "campaign_id", "left")
        .join(clk, "campaign_id", "left")
        .select(
            "campaign_id",
            "campaign_name",
            "bid",
            "budget",
            F.coalesce("impressions", F.lit(0)).alias("impressions"),
            F.coalesce("clicks", F.lit(0)).alias("clicks"),
            F.try_divide(
                F.col("bid").cast("double") * F.coalesce("impressions", F.lit(0)),
                F.nullif(F.coalesce("clicks", F.lit(0)), F.lit(0)),
            ).alias("cost_per_click"),
        )
    )


def advertiser_performance(
    advertiser: DataFrame, campaign: DataFrame, impressions: DataFrame, clicks: DataFrame
) -> DataFrame:
    """mv_advertiser_performance (kpi_views.sql:103-128): per-advertiser
    campaign_count, total_budget, counts, ctr — advertisers with zero
    campaigns included (left-join null path)."""
    camp = campaign.select(F.col("id").alias("campaign_id"), "advertiser_id", "budget")
    imp = impressions.groupBy("campaign_id").agg(F.countDistinct("id").alias("impressions"))
    clk = clicks.groupBy("campaign_id").agg(F.countDistinct("id").alias("clicks"))
    per_camp = (
        camp.join(imp, "campaign_id", "left")
        .join(clk, "campaign_id", "left")
        .groupBy("advertiser_id")
        .agg(
            F.countDistinct("campaign_id").alias("campaign_count"),
            F.sum("budget").alias("total_budget"),
            F.sum(F.coalesce("impressions", F.lit(0))).alias("impressions"),
            F.sum(F.coalesce("clicks", F.lit(0))).alias("clicks"),
        )
    )
    return (
        advertiser.select(F.col("id").alias("advertiser_id"), F.col("name").alias("advertiser_name"))
        .join(per_camp, "advertiser_id", "left")
        .select(
            "advertiser_id",
            "advertiser_name",
            F.coalesce("campaign_count", F.lit(0)).alias("campaign_count"),
            F.coalesce("total_budget", F.lit(0).cast("decimal(10,2)")).alias("total_budget"),
            F.coalesce("impressions", F.lit(0)).alias("impressions"),
            F.coalesce("clicks", F.lit(0)).alias("clicks"),
            F.try_divide(F.coalesce("clicks", F.lit(0)), F.coalesce("impressions", F.lit(0))).alias("ctr"),
        )
    )


def campaign_ctr_naive(
    advertiser: DataFrame, campaign: DataFrame, impressions: DataFrame, clicks: DataFrame
) -> DataFrame:
    """The reference's literal join-then-COUNT-DISTINCT shape
    (kpi_views.sql:16-27) — kept ONLY as the equivalence baseline for
    tests; do not use at scale (facts × facts row explosion)."""
    return (
        campaign.alias("c")
        .join(advertiser.alias("a"), F.col("c.advertiser_id") == F.col("a.id"))
        .join(impressions.alias("i"), F.col("c.id") == F.col("i.campaign_id"), "left")
        .join(clicks.alias("cl"), F.col("c.id") == F.col("cl.campaign_id"), "left")
        .groupBy(F.col("c.id").alias("campaign_id"), F.col("c.name").alias("campaign_name"), F.col("a.name").alias("advertiser_name"))
        .agg(
            F.countDistinct(F.col("i.id")).alias("impressions"),
            F.countDistinct(F.col("cl.id")).alias("clicks"),
        )
        .withColumn("ctr", F.try_divide("clicks", "impressions"))
    )
