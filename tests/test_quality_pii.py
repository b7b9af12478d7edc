"""Quality gates (T18), PII redaction (T19), mixture sampling (T20):
unit semantics, driver-side reference parity, and plan-shape asserts.
The driver-oracle entries (corpus_quality_gates, pii_redact_documents,
mixture_sample_split) pin full value equality vs DuckDB; these tests
pin the semantics the oracle can't see — edge cases, idempotence,
expected sampling mass, and the no-shuffle plan shapes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_cdc.functions.pii import PII_PATTERNS, pii_counts, redact_pii, scrub_documents
from spark_cdc.operators.quality import (
    DEFAULT_GATES,
    filter_quality,
    quality_gates,
)
from spark_cdc.operators.sampling import mixture_rates, mixture_sample


# ---------------------------------------------------------------- quality

def test_quality_metrics_hand_computed(spark):
    # "a b a b a b": 6 words, bigrams [a b, b a, a b, b a, a b] -> top 3/5
    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),
            (2, ""),
            (3, "   \t "),
            (4, "one"),
            (5, "the quick brown fox jumps over the lazy dog again"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in quality_gates(df).collect()}
    r1 = rows[1]
    assert r1["n_words"] == 6
    assert r1["mean_word_len"] == 1.0
    assert r1["dup_word_frac"] == pytest.approx(1 - 2 / 6, abs=1e-6)
    assert r1["top_bigram_frac"] == pytest.approx(3 / 5, abs=1e-6)
    assert r1["stopword_frac"] == pytest.approx(3 / 6, abs=1e-6)  # 'a' x3
    # empty / whitespace-only: all metrics zero, gated out
    for d in (2, 3):
        r = rows[d]
        assert r["n_words"] == 0
        assert (
            r["mean_word_len"] == r["dup_word_frac"]
            == r["top_bigram_frac"] == r["stopword_frac"] == 0.0
        )
        assert not r["keep"]
    # single word: no bigrams -> frac 0, not NULL/NaN
    assert rows[4]["top_bigram_frac"] == 0.0
    r5 = rows[5]
    assert r5["n_words"] == 10
    assert r5["dup_word_frac"] == pytest.approx(1 - 9 / 10, abs=1e-6)  # 'the' twice
    assert r5["top_bigram_frac"] == pytest.approx(1 / 9, abs=1e-6)
    assert r5["stopword_frac"] == pytest.approx(2 / 10, abs=1e-6)


def test_quality_gate_thresholds_and_filter(spark):
    """keep is the AND of the five gates; filter_quality preserves the
    caller's schema and drops exactly the failing docs."""
    good = "the quick brown fox jumps over a lazy dog and then it sits on that hill to rest in peace for an hour"
    df = spark.createDataFrame(
        [
            (1, good),  # passes all
            (2, "word " * 30),  # dup_word_frac ~0.97, top bigram 1.0
            (3, "tiny doc the end"),  # n_words < 20
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["keep"] for r in quality_gates(df).collect()}
    assert got == {1: True, 2: False, 3: False}
    kept = filter_quality(df)
    assert kept.columns == df.columns
    assert [r["doc_id"] for r in kept.collect()] == [1]
    # custom gates override defaults
    loose = quality_gates(df, gates={**DEFAULT_GATES, "min_words": 1,
                                     "max_dup_word_frac": 1.0,
                                     "max_top_bigram_frac": 1.0,
                                     "min_stopword_frac": 0.0})
    assert all(r["keep"] for r in loose.collect())


def test_quality_gates_single_scan_no_shuffle(spark, sf_dir="/root/testdata/sf0.001"):
    """The whole gate is a projection: no Exchange anywhere in the plan."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = quality_gates(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# -------------------------------------------------------------------- pii

CASES = [
    ("mail me at jane.doe+x@sub.example.co.uk now", "<EMAIL>", "jane.doe+x@sub.example.co.uk"),
    ("cards 4111 1111 1111 1111 and 5500-0000-0000-0004", "<CARD>", "4111 1111 1111 1111"),
    ("ssn 123-45-6789.", "<SSN>", "123-45-6789"),
    ("call 555-867-5309 or 555.867.5309", "<PHONE>", "555-867-5309"),
    ("host 192.168.0.1 responded", "<IP>", "192.168.0.1"),
]


def test_pii_redaction_per_type(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, _, _) in enumerate(CASES)], "id long, text string"
    )
    got = {r["id"]: r["text"] for r in
           df.select("id", redact_pii(F.col("text")).alias("text")).collect()}
    for i, (raw, tag, ident) in enumerate(CASES):
        assert tag in got[i], (raw, got[i])
        assert ident not in got[i], (raw, got[i])


def test_pii_counts_and_total(spark):
    # NOTE: a word separates phone and card — the longer all-digit
    # card pattern runs first and would otherwise consume the phone's
    # trailing 4 digits plus the card's first 12 (adjacent PII is
    # redacted either way, just under one tag instead of two)
    text = ("a@b.co c@d.org 10.0.0.1 123-45-6789 555-123-4567 card "
            "4111 1111 1111 1111")
    df = spark.createDataFrame([(1, text)], "id long, text string")
    out = scrub_documents(df).collect()[0]
    assert out["pii_email"] == 2
    assert out["pii_ipv4"] == 1
    assert out["pii_ssn"] == 1
    assert out["pii_phone"] == 1
    assert out["pii_card"] == 1
    assert out["pii_total"] == 6
    # every identifier replaced in the redacted text
    for tag in ("<EMAIL>", "<IP>", "<SSN>", "<PHONE>", "<CARD>"):
        assert tag in out["text"]


def test_pii_redaction_idempotent_and_subset(spark):
    """Redacting already-redacted text is a no-op; `types` restricts."""
    text = "a@b.co and 10.0.0.1"
    df = spark.createDataFrame([(1, text)], "id long, text string")
    once = df.select(redact_pii(F.col("text")).alias("text"))
    twice = once.select(redact_pii(F.col("text")).alias("text"))
    assert once.collect() == twice.collect()
    only_email = df.select(redact_pii(F.col("text"), types=["email"]).alias("text")).collect()[0]["text"]
    assert "<EMAIL>" in only_email and "10.0.0.1" in only_email


def test_pii_patterns_re2_compatible():
    """Every shipped pattern must stay inside the RE2 subset so the
    DuckDB oracle (and any Go/Rust sidecar scrubber) reproduces the
    redaction exactly: no backrefs, no lookaround."""
    for name, pat, _ in PII_PATTERNS:
        assert "(?=" not in pat and "(?!" not in pat and "(?<" not in pat, name
        assert "\\1" not in pat, name


# ---------------------------------------------------------------- mixture

def test_mixture_rates_reference_form():
    counts = {"en": 800, "fr": 100, "zh": 100}
    r1 = mixture_rates(counts, alpha=1.0, target_fraction=0.4)
    # alpha=1: every domain keeps exactly the target fraction
    assert all(abs(v - 0.4) < 1e-12 for v in r1.values())
    r05 = mixture_rates(counts, alpha=0.5, target_fraction=0.4)
    # temperature flattening: dominant domain downsampled harder
    assert r05["en"] < 0.4 < r05["fr"] == r05["zh"]
    # rates cap at 1
    rcap = mixture_rates({"en": 1000, "xx": 1}, alpha=0.0, target_fraction=0.9)
    assert rcap["xx"] == 1.0


def test_mixture_sample_mass_and_determinism(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    out = mixture_sample(docs, "lang", "doc_id", alpha=0.5, target_fraction=0.5)
    rows = out.select("doc_id", "lang", "sampled").collect()
    n = len(rows)
    kept = sum(r["sampled"] for r in rows)
    # expected mass = target_fraction +- hash noise (4-hex granularity,
    # 500 docs -> generous band)
    assert 0.38 <= kept / n <= 0.62
    # per-domain mass follows the computed rate
    counts = {r["lang"]: 0 for r in rows}
    keptc = dict(counts)
    for r in rows:
        counts[r["lang"]] += 1
        keptc[r["lang"]] += r["sampled"]
    rates = mixture_rates(counts, alpha=0.5, target_fraction=0.5)
    for d, rate in rates.items():
        assert abs(keptc[d] / counts[d] - rate) < 0.2, d
    # pure function of (key, domain counts): identical on re-run
    again = {(r["doc_id"]): r["sampled"]
             for r in mixture_sample(docs, "lang", "doc_id", alpha=0.5,
                                     target_fraction=0.5).collect()}
    assert all(again[r["doc_id"]] == r["sampled"] for r in rows)


def test_mixture_sample_plan_broadcasts_rates(spark):
    """The corpus side must not shuffle: the rate table joins back via
    broadcast, and no SortMergeJoin appears anywhere."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        mixture_sample(docs, "lang", "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan


# ----------------------------------------------- CDC-maintained store

def test_quality_store_maintained_via_feed(spark, tmp_path):
    """quality_gates is a keyed row-wise projection, so the generic
    MaintainedProjection keeps a CDC-live per-document quality store:
    maintained metrics == re-running the gates on the final corpus
    after insert/update/delete batches. Also a regression probe for
    the Spark 4.1 PruneFilters union+lambda landmine: the gate's
    higher-order-function metrics sit inside a union branch (projection
    ∪ tombstones) whose result the MERGE then joins."""
    from pyspark.sql import types as T

    from spark_cdc.cdc.apply import apply_batch
    from spark_cdc.lake.feed import ChangeFeedConsumer
    from spark_cdc.lake.table import LakeTable
    from spark_cdc.operators.index_maint import MaintainedProjection

    docs_schema = T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ])

    def project(df):
        return quality_gates(df, text_col="text").select(
            "doc_id", "n_words", "mean_word_len", "dup_word_frac",
            "top_bigram_frac", "stopword_frac",
            F.col("keep").cast("boolean").alias("keep"),
        )

    q_schema = T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_words", T.IntegerType(), True),
        T.StructField("mean_word_len", T.DoubleType(), True),
        T.StructField("dup_word_frac", T.DoubleType(), True),
        T.StructField("top_bigram_frac", T.DoubleType(), True),
        T.StructField("stopword_frac", T.DoubleType(), True),
        T.StructField("keep", T.BooleanType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ])
    docs = LakeTable.create(
        spark, str(tmp_path / "docs"), docs_schema,
        key_columns=["doc_id"], num_buckets=4,
    )
    store = LakeTable.create(
        spark, str(tmp_path / "quality"), q_schema,
        key_columns=["doc_id"], num_buckets=4,
    )
    maint = MaintainedProjection(
        store, ChangeFeedConsumer(docs, str(tmp_path / "cursor")), project
    )

    def env(rows, i, op):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        return df.select(
            F.col("doc_id").alias("lsn"),
            F.lit(i).cast("long").alias("op_seq"),
            F.lit(op).alias("op"),
            "doc_id", "text",
            F.timestamp_seconds(F.lit(i)).alias("ts"),
        )

    texts = [
        (i, f"the doc w{i} talks of a value and that value repeats in "
            f"a table of sorts with key k{i} on it to make twenty words")
        for i in range(20)
    ]
    apply_batch(docs, env(texts, 0, "c"), batch_id=0, collect_lineage=False)
    maint.catch_up()
    # update one doc to degenerate repetition, delete another
    apply_batch(docs, env([(3, "spam " * 25)], 1, "c"), batch_id=1,
                collect_lineage=False)
    apply_batch(docs, env([(7, None)], 2, "d"), batch_id=2,
                collect_lineage=False)
    maint.catch_up()

    def as_map(df):
        return {
            r["doc_id"]: (r["n_words"], r["mean_word_len"], r["dup_word_frac"],
                          r["top_bigram_frac"], r["stopword_frac"], r["keep"])
            for r in df.collect()
        }

    want = as_map(project(docs.read().select("doc_id", "text")))
    got = as_map(maint.read().drop("ts"))
    assert got == want
    assert 7 not in got
    assert got[3][5] is False  # the spam rewrite fails the gates


# --------------------------------------------- line dedup + char-LM

def test_dedup_lines_order_preserving(spark):
    from spark_cdc.operators.quality import dedup_lines

    df = spark.createDataFrame(
        [
            (1, "a\nb\na\nc\nb"),
            (2, "nav\nbody one\nnav\nbody two\nnav\nfooter\nfooter"),
            (3, "only"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["text"] for r in dedup_lines(df).collect()}
    assert got[1] == "a\nb\nc"
    assert got[2] == "nav\nbody one\nbody two\nfooter"
    assert got[3] == "only"
    # idempotent
    twice = {r["doc_id"]: r["text"] for r in dedup_lines(dedup_lines(df)).collect()}
    assert twice == got
    # custom separator
    df2 = spark.createDataFrame([(1, "x | y | x | z")], "doc_id long, text string")
    from spark_cdc.operators.quality import dedup_lines_expr
    assert df2.select(
        dedup_lines_expr(F.col("text"), " | ").alias("t")
    ).collect()[0]["t"] == "x | y | z"


def _ref_char_lm(train_texts, score_texts, n=3):
    """Pure-python reference of CharLM (add-one smoothed char n-grams)."""
    import math
    import re
    from collections import Counter

    def grams(t):
        t = re.sub(r"\s+", " ", (t or "")).strip().lower()
        return [t[i:i + n] for i in range(len(t) - n + 1)] if len(t) >= n else []

    cnt = Counter(g for t in train_texts for g in grams(t))
    ctx = Counter()
    for g, c in cnt.items():
        ctx[g[: n - 1]] += c
    v = len({g[n - 1] for g in cnt})
    out = []
    for t in score_texts:
        gs = grams(t)
        if not gs:
            out.append(None)
            continue
        out.append(
            sum(math.log((cnt.get(g, 0) + 1) / (ctx.get(g[: n - 1], 0) + v))
                for g in gs) / len(gs)
        )
    return out


def test_char_lm_matches_reference_and_ranks_junk(spark):
    from spark_cdc.operators.quality import CharLM

    train = [
        "the quick brown fox jumps over the lazy dog",
        "a stitch in time saves nine and the early bird catches the worm",
        "to be or not to be that is the question",
    ]
    score = [
        "the quick bird saves the dog",          # natural, in-distribution
        "qzx vwk jjq zzz xqv kkjj wzx",           # junk
        "the the the the",                        # repetitive but seen
        "",                                       # empty -> NULL
        "ab",                                     # shorter than n -> NULL
    ]
    lm = CharLM.train(
        spark.createDataFrame([(t,) for t in train], "text string"), n=3
    )
    got_rows = lm.score(
        spark.createDataFrame(
            [(i, t) for i, t in enumerate(score)], "doc_id long, text string"
        ),
        id_col="doc_id",
    ).collect()
    got = {r["doc_id"]: r["lm_score"] for r in got_rows}
    want = _ref_char_lm(train, score)
    for i, w in enumerate(want):
        if w is None:
            assert got[i] is None
        else:
            assert got[i] == pytest.approx(w, abs=2e-6), i
    assert got[0] > got[1], "natural text must outscore junk"


def test_char_lm_plan_broadcasts_model(spark):
    from spark_cdc.operators.quality import CharLM

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    lm = CharLM.train(docs, n=3)
    plan = (
        lm.score(docs, id_col="doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


# -------------------------------------- randomized reference equality

def _rand_corpus(n=200, seed=17):
    """Seeded adversarial strings: part natural text, part
    digit/dot/dash soup that brushes against every PII pattern, part
    whitespace pathology."""
    import random

    rng = random.Random(seed)
    words = ["the", "fox", "data", "10", "3.14", "a-b", "x", "..", "--", ""]
    out = []
    for i in range(n):
        k = rng.randint(0, 30)
        parts = [rng.choice(words) for _ in range(k)]
        if rng.random() < 0.4:
            parts.append(f"u{rng.randint(0,999)}@ex{rng.randint(0,9)}.com")
        if rng.random() < 0.4:
            parts.append(".".join(str(rng.randint(0, 300)) for _ in range(4)))
        if rng.random() < 0.3:
            parts.append(f"{rng.randint(0,999):03d}-{rng.randint(0,99):02d}-{rng.randint(0,9999):04d}")
        if rng.random() < 0.3:
            parts.append(f"{rng.randint(0,999):03d}.{rng.randint(0,999):03d}.{rng.randint(0,9999):04d}")
        if rng.random() < 0.2:
            parts.append(" ".join(f"{rng.randint(0,9999):04d}" for _ in range(4)))
        sep = rng.choice([" ", "  ", " \t ", "\n"])
        out.append((i, sep.join(parts)))
    return out


def test_pii_redaction_matches_python_re(spark):
    """The shipped patterns behave identically under Java regex and
    Python re (both backtracking engines over the shared subset) — a
    cross-engine guard beyond the DuckDB/RE2 oracle."""
    import re

    rows = _rand_corpus()
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r["text"] for r in
           df.select("id", redact_pii(F.col("text")).alias("text")).collect()}
    for i, text in rows:
        want = text
        for _, pat, rep in PII_PATTERNS:
            want = re.sub(pat, rep, want)
        assert got[i] == want, (i, text, got[i], want)


def test_quality_metrics_match_python_reference(spark):
    """All five gate metrics against an independent python
    implementation over the adversarial corpus (whitespace pathology,
    empty docs, single words)."""
    from collections import Counter

    rows = _rand_corpus(seed=23)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in quality_gates(df).collect()}
    for i, text in rows:
        ws = [w for w in text.split() if w]
        n = len(ws)
        mwl = sum(len(w) for w in ws) / n if n else 0.0
        dwf = 1 - len(set(ws)) / n if n else 0.0
        bg = [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        tbf = max(Counter(bg).values()) / len(bg) if bg else 0.0
        from spark_cdc.operators.quality import STOPWORDS
        swf = sum(w in STOPWORDS for w in ws) / n if n else 0.0
        r = got[i]
        assert r["n_words"] == n, (i, text)
        assert r["mean_word_len"] == pytest.approx(mwl, abs=1e-6), i
        assert r["dup_word_frac"] == pytest.approx(dwf, abs=1e-6), i
        assert r["top_bigram_frac"] == pytest.approx(tbf, abs=1e-6), i
        assert r["stopword_frac"] == pytest.approx(swf, abs=1e-6), i


def test_dedup_lines_matches_python_reference(spark):
    from spark_cdc.operators.quality import dedup_lines

    import random

    rng = random.Random(5)
    rows = []
    for i in range(120):
        lines = [rng.choice(["nav", "foot", "", "body one", "body 2", "x y",
                             " lead", "trail "]) for _ in range(rng.randint(1, 12))]
        rows.append((i, "\n".join(lines)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["text"] for r in dedup_lines(df).collect()}
    for i, text in rows:
        seen, keep = set(), []
        for ln in text.split("\n"):
            if ln not in seen:
                seen.add(ln)
                keep.append(ln)
        assert got[i] == "\n".join(keep), (i, text)


def test_mixture_sample_frozen_rates(spark):
    """Frozen rates: assignments become a pure function of the key —
    a re-crawl that doubles one domain does NOT reshuffle previously
    kept documents (live rates would); unknown domains are kept out
    with rate 0."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    counts = {r["lang"]: r["cnt"] for r in
              docs.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    frozen = mixture_rates(counts, alpha=0.5, target_fraction=0.5)
    base = {r["doc_id"]: r["sampled"] for r in
            mixture_sample(docs, "lang", "doc_id", rates=frozen).collect()}
    # equals the live computation on the SAME corpus
    live = {r["doc_id"]: r["sampled"] for r in
            mixture_sample(docs, "lang", "doc_id", alpha=0.5,
                           target_fraction=0.5).collect()}
    assert base == live
    # grow one domain 2x: frozen keeps every old assignment
    grown = docs.unionByName(
        docs.where(F.col("lang") == "en")
        .withColumn("doc_id", F.col("doc_id") + 1_000_000)
    )
    after = {r["doc_id"]: r["sampled"] for r in
             mixture_sample(grown, "lang", "doc_id", rates=frozen).collect()}
    assert all(after[k] == v for k, v in base.items())
    # live rates on the grown corpus DO shift en assignments (sanity
    # that the frozen path is the thing preventing it)
    live_after = {r["doc_id"]: r["sampled"] for r in
                  mixture_sample(grown, "lang", "doc_id", alpha=0.5,
                                 target_fraction=0.5).collect()}
    assert any(live_after[k] != v for k, v in base.items())
    # unknown domain -> rate 0, loudly excluded
    alien = spark.createDataFrame([(9_999_999, "xx")], "doc_id long, lang string")
    got = mixture_sample(docs.select("doc_id", "lang").unionByName(alien),
                         "lang", "doc_id", rates=frozen)
    assert got.where(F.col("lang") == "xx").collect()[0]["sampled"] == 0


def test_gate_changes_cdc_semantics(spark, tmp_path):
    """Quality gating of a change stream must be op-correct: a
    degrading update DELETES the doc from the serving table (skipping
    the event would leave the stale good version serving), and a later
    improving update re-inserts it."""
    from pyspark.sql import types as T

    from spark_cdc.cdc.apply import apply_batch
    from spark_cdc.lake.table import LakeTable
    from spark_cdc.operators.quality import gate_changes

    good = ("the quick brown fox jumps over a lazy dog and then it sits "
            "on that hill to rest in peace for an hour")
    spam = "spam " * 25

    schema = T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ])
    table = LakeTable.create(spark, str(tmp_path / "t"), schema,
                             key_columns=["doc_id"], num_buckets=4)

    def env(rows, i, op):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        return df.select(
            F.col("doc_id").alias("lsn"), F.lit(i).cast("long").alias("op_seq"),
            F.lit(op).alias("op"), "doc_id", "text",
            F.timestamp_seconds(F.lit(i)).alias("ts"),
        )

    # batch 0: one good doc, one spam doc -> only the good one lands
    apply_batch(table, gate_changes(env([(1, good), (2, spam)], 0, "c")),
                batch_id=0, collect_lineage=False)
    assert {r["doc_id"] for r in table.read().collect()} == {1}
    # batch 1: doc 1 degrades to spam -> must DISAPPEAR from the table
    apply_batch(table, gate_changes(env([(1, spam)], 1, "u")),
                batch_id=1, collect_lineage=False)
    assert table.read().count() == 0
    # batch 2: doc 2 improves -> re-inserted
    apply_batch(table, gate_changes(env([(2, good)], 2, "u")),
                batch_id=2, collect_lineage=False)
    assert {r["doc_id"] for r in table.read().collect()} == {2}
    # batch 3: genuine delete passes through
    apply_batch(table, gate_changes(env([(2, None)], 3, "d")),
                batch_id=3, collect_lineage=False)
    assert table.read().count() == 0
