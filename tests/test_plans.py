"""Physical-plan assertions: the optimizations SURVEY.md §4 claims are
'built-in' must actually show up in the plans (pushdown, pruning,
broadcast, no Python in JVM-only paths)."""

from __future__ import annotations

from spark_cdc.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(spark, name) -> str:
    df = QUERIES[name](spark, SF)
    df.collect()  # finalize AQE so the plan shows actual stages
    return df._jdf.queryExecution().executedPlan().toString()


def test_watermark_filter_pushed_to_scan(spark):
    plan = _plan(spark, "s1_incremental_scan")
    assert "PushedFilters: [IsNotNull(ts), GreaterThan(ts" in plan, plan


def test_column_pruning_reaches_scan(spark):
    # the asof entry selects (event_id, user_id, ts) from events: the
    # pruned projection must reach every parquet scan — no props/value
    plan = _plan(spark, "j_asof_latest_order")
    reads = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert reads
    for read in reads:
        assert "props" not in read and "value" not in read, read


def test_dim_join_is_broadcast(spark):
    plan = _plan(spark, "j1_orders_customer_segment")
    assert "BroadcastHashJoin" in plan, plan


def test_dedup_has_partial_combine_not_window(spark):
    # the skew-proof dedup must have a map-side partial aggregate
    # (partial_max_by before the exchange), never a Window sort of the
    # raw stream (Window = all duplicates of a hot key on one reducer)
    plan = _plan(spark, "w1_latest_event_per_user_type")
    assert "partial_max_by" in plan, plan
    assert "Window" not in plan, plan


def test_jvm_only_text_path_has_no_python(spark):
    # text quality/lang-id are pure column expressions: no
    # BatchEvalPython / ArrowEvalPython stages in the plan
    plan = _plan(spark, "text_profile")
    assert "EvalPython" not in plan, plan


def test_ann_lsh_plan_has_no_cartesian(spark):
    # the LSH scale path must candidate via equi-joins on (table,
    # bucket) — a cartesian/nested-loop product would mean the O(n·q)
    # brute force snuck back in
    plan = _plan(spark, "ann_topk_lsh")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_lsh_dedup_plan_has_no_cartesian(spark):
    for name in ("dedup_minhash_lsh", "dedup_simhash"):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, (name, plan)
        assert "BroadcastNestedLoopJoin" not in plan, (name, plan)


def test_mor_bulk_delta_is_single_exchange(spark, tmp_path):
    """The bulk MoR dedup plan must shuffle exactly once (on the
    bucket): HashPartitioning(bucket) satisfies groupBy(bucket, key)'s
    clustering, so no second exchange may appear — the one-exchange
    property the 10^10-event ingest path depends on."""
    from pyspark.sql import functions as F

    from spark_cdc.cdc.envelope import KEY_COLUMNS, PAYLOAD_SCHEMA
    from spark_cdc.lake.merge import build_mor_bulk_delta
    from spark_cdc.lake.table import LakeTable
    from spark_cdc.sources.changelog import generate_change_log

    table = LakeTable.create(
        spark, str(tmp_path / "t"), PAYLOAD_SCHEMA, key_columns=KEY_COLUMNS, num_buckets=8
    )
    src = generate_change_log(spark, n_events=2000, n_convs=50, seed=1, partitions=4)
    payload_cols = [f.name for f in table.user_schema.fields]
    win_payload = F.struct(
        *[F.col(c).alias(c) for c in payload_cols],
        F.col("op").alias("__op"),
        F.col("ts").cast("timestamp").alias("_v_ts"),
        F.coalesce(F.col("op_seq").cast("long"), F.lit(-1)).alias("_v_seq"),
    )
    batch_ord = F.struct(F.col("ts"), F.col("op_seq"), F.col("lsn"))
    delta = build_mor_bulk_delta(
        src, table, KEY_COLUMNS, payload_cols, win_payload, batch_ord, "d", 1
    )
    delta.collect()
    plan = delta._jdf.queryExecution().executedPlan().toString()
    # AQE prints the final AND the initial plan; count only the final
    final = plan.split("== Initial Plan ==")[0]
    n_exchanges = final.count("Exchange hashpartitioning")
    assert n_exchanges == 1, final


def test_wholestage_codegen_in_flagship(spark):
    # '*(n)' prefixes mark whole-stage-codegen stages in the plan text
    plan = _plan(spark, "tpch_q1_pricing_summary")
    assert "*(1)" in plan, plan
    assert "HashAggregate" in plan and "partial_sum" in plan, plan


def test_mor_bulk_delta_sql_equals_dataframe_form(spark, tmp_path):
    """The cached-SQL bulk delta (one parse/analyze per batch instead
    of one per DataFrame transformation) must produce the exact same
    rows AND keep the single-Exchange property."""
    from pyspark.sql import functions as F

    from spark_cdc.cdc.envelope import KEY_COLUMNS, PAYLOAD_SCHEMA
    from spark_cdc.lake.merge import build_mor_bulk_delta, build_mor_bulk_delta_sql
    from spark_cdc.lake.table import LakeTable
    from spark_cdc.sources.changelog import generate_change_log

    table = LakeTable.create(
        spark, str(tmp_path / "t"), PAYLOAD_SCHEMA, key_columns=KEY_COLUMNS, num_buckets=8
    )
    src = generate_change_log(spark, n_events=2000, n_convs=50, seed=1, partitions=4)
    payload_cols = [f.name for f in table.user_schema.fields]
    win_payload = F.struct(
        *[F.col(c).alias(c) for c in payload_cols],
        F.col("op").alias("__op"),
        F.col("ts").cast("timestamp").alias("_v_ts"),
        F.coalesce(F.col("op_seq").cast("long"), F.lit(-1)).alias("_v_seq"),
    )
    batch_ord = F.struct(
        F.coalesce(F.col("ts").cast("timestamp"), F.to_timestamp(F.lit("1900-01-01"))),
        F.coalesce(F.col("op_seq").cast("long"), F.lit(-1)),
        F.col("lsn").cast("long"),
    )
    df_form = build_mor_bulk_delta(
        src, table, KEY_COLUMNS, payload_cols, win_payload, batch_ord, "d", 7
    )
    sql_form = build_mor_bulk_delta_sql(
        src, table, KEY_COLUMNS, "op", "ts", "op_seq", "lsn", "d", 7
    )
    assert sorted(df_form.columns) == sorted(sql_form.columns)
    cols = sorted(df_form.columns)
    a = sorted(tuple(r[c] for c in cols) for r in df_form.collect())
    b = sorted(tuple(r[c] for c in cols) for r in sql_form.collect())
    assert a == b
    plan = sql_form._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 1, final


def test_cow_bulk_sql_replay_reference_equal_and_single_exchange(spark, tmp_path):
    """The cached-SQL CoW bulk path must end reference-equal to the
    one-shot replay oracle across multi-batch replays (updates,
    deletes, duplicates, out-of-order lsn) and keep the one-exchange
    plan shape."""
    from pyspark.sql import functions as F

    from spark_cdc.cdc.apply import apply_batch, replay_changes_df
    from spark_cdc.cdc.envelope import KEY_COLUMNS, PAYLOAD_SCHEMA
    from spark_cdc.lake.merge import build_cow_bulk_resolved_sql
    from spark_cdc.lake.table import LakeTable
    from spark_cdc.sources.changelog import generate_change_log

    log = generate_change_log(
        spark, n_events=4000, n_convs=80, seed=3, partitions=4
    ).localCheckpoint()
    table = LakeTable.create(
        spark, str(tmp_path / "t"), PAYLOAD_SCHEMA, key_columns=KEY_COLUMNS, num_buckets=8
    )
    for i in range(4):
        batch = log.where((F.col("lsn") >= i * 1000) & (F.col("lsn") < (i + 1) * 1000))
        apply_batch(table, batch, batch_id=i, mode="cow",
                    collect_stats=False, collect_lineage=False)
    got = table.read()
    want = replay_changes_df(log, KEY_COLUMNS).select(*got.columns)
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0

    tgt = table.read(include_hidden=True, resolve=False)
    resolved = build_cow_bulk_resolved_sql(
        log.limit(100), tgt, table, KEY_COLUMNS, "op", "ts", "op_seq", "lsn", "d"
    )
    plan = resolved._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 1, final


def test_dedup_corpus_plan_scales(spark):
    """dedup_corpus(exact): no cartesian product, no per-group array
    aggregation, map-side partial combine present — the constructs that
    decide whether the op survives a 10^8-member duplicate group."""
    from spark_cdc.operators.dedup_ops import dedup_corpus

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = dedup_corpus(docs, method="exact")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "collect_list" not in plan
    assert "partial_count" in plan or "Partial" in plan


def test_decode_media_plan_no_shuffle(spark):
    """Media decode is a stateless per-batch map: zero exchanges."""
    from spark_cdc.operators import multimodal

    dec = multimodal.decode_media(multimodal.generate_decodable_media_fixture(spark, 50))
    plan = dec._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_bm25_topk_is_distributed_takeordered(spark):
    """Round-4 finding #2: the BM25 top-k must plan as TakeOrdered
    (per-partition local k + driver combine), NOT a global row_number
    window that funnels every matching doc through one task. With a
    prebuilt index, docs=None proves structurally that the corpus is
    never rescanned on the query path."""
    from pyspark.sql import functions as F

    from spark_cdc.operators.search import bm25_index, bm25_topk, index_stats

    docs = spark.read.parquet(SF + "/documents.parquet")
    idx = bm25_index(docs).cache()
    try:
        df = bm25_topk(None, "spark merge window", k=10, index=idx,
                       stats=index_stats(idx))
        rows = df.collect()
        assert len(rows) == 10 and [r["rank"] for r in rows] == list(range(1, 11))
        plan = df._jdf.queryExecution().executedPlan().toString()
        # AQE prints "Final Plan" then "Initial Plan"; assert on final
        final = plan.split("== Initial Plan ==")[0]
        assert "TakeOrderedAndProject" in final, plan
        # the only Window is the rank assignment OVER the k survivors:
        # it must be a PARENT of the TakeOrdered limit (printed above
        # it), never below it scanning the corpus-wide score stream
        assert final.index("Window") < final.index("TakeOrderedAndProject"), plan
        assert final.count("Window") == 1, plan
        # scores equal the docs-path form (stats from index vs corpus
        # agree on this fixture: every doc has >= 1 token)
        direct = {r["doc_id"]: round(r["score"], 9)
                  for r in bm25_topk(docs, "spark merge window", k=10).collect()}
        got = {r["doc_id"]: round(r["score"], 9) for r in rows}
        assert got == direct
    finally:
        idx.unpersist()


def test_bm25_batch_join_count_invariant_in_query_count(spark):
    """bm25_batch_scores: N queries ride ONE probe pass — the plan has
    exactly the same join structure (one df-stats broadcast join + one
    query-membership broadcast join over one postings filter) whether
    the batch carries 2 queries or 4. Per-query jobs would scale scans
    and shuffles with N; the batch form must not."""
    from spark_cdc.operators.search import bm25_batch_scores, bm25_index

    docs = spark.read.parquet(SF + "/documents.parquet")
    idx = bm25_index(docs).cache()
    try:
        q2 = [(1, "spark merge"), (2, "vector hash")]
        q4 = q2 + [(3, "stream batch"), (4, "scan window")]
        plans = []
        for qs in (q2, q4):
            df = bm25_batch_scores(None, qs, index=idx)
            df.collect()
            plans.append(
                df._jdf.queryExecution().executedPlan().toString()
                .split("== Initial Plan ==")[0]
            )
        for marker in ("BroadcastHashJoin", "HashAggregate", "Exchange"):
            assert plans[0].count(marker) == plans[1].count(marker), marker
        assert plans[1].count("BroadcastHashJoin") == 2, plans[1]
    finally:
        idx.unpersist()


def test_incremental_lsh_probe_never_shuffles_index(spark):
    """Re-crawl probe: the maintained bucket index must STREAM through
    a broadcast join with the new batch's exploded bands — no sort-merge
    join, so the 10^9-doc index side is never exchanged/sorted to
    co-partition with a small crawl batch. (The only Exchange left is
    the distinct over the collision output, which is bounded.)"""
    from pyspark.sql import functions as F

    from spark_cdc.operators.dedup_ops import (
        incremental_lsh_candidates,
        minhash_band_buckets,
    )

    docs = spark.read.parquet(SF + "/documents.parquet").select("doc_id", "text")
    idx = minhash_band_buckets(docs.where(F.col("doc_id") < 400))
    new = docs.where(F.col("doc_id") >= 400).limit(50)
    cand = incremental_lsh_candidates(new, idx)
    cand.collect()
    plan = (
        cand._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
