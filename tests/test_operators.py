"""Dedup family, ANN, multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_cdc.operators import ann, dedup_ops, multimodal


@pytest.fixture(scope="module")
def docs(spark):
    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # plant: 600=exact dup of 0 (modulo whitespace), 601=near dup of 1
    d0, d1 = [r["text"] for r in base.where(F.col("doc_id").isin(0, 1)).orderBy("doc_id").collect()]
    extra = spark.createDataFrame(
        [
            (600, "  " + d0.upper() + "  ", "en", "planted", len(d0)),
            (601, d1 + " extra tail word", "en", "planted", len(d1)),
        ],
        base.schema,
    )
    return base.unionByName(extra)


def test_exact_duplicates(spark, docs):
    # row form: one membership row per duplicate-group member
    rows = dedup_ops.exact_duplicates(docs).collect()
    planted = {r["doc_id"]: r for r in rows if r["keep_id"] == 0}
    assert set(planted) == {0, 600}
    assert all(r["n_docs"] == 2 for r in planted.values())
    # array form still available behind the small-corpus flag
    groups = dedup_ops.exact_duplicates(docs, member_arrays=True).collect()
    assert any(set(g["doc_ids"]) == {0, 600} for g in groups)


def test_dedup_corpus(spark, docs):
    n = docs.count()
    # exact: drops 600 (whitespace-normalized dup of 0), keeps 0
    kept = {r["doc_id"] for r in
            dedup_ops.dedup_corpus(docs, method="exact").select("doc_id").collect()}
    assert 0 in kept and 600 not in kept
    assert len(kept) == n - 1
    # components: also folds the near-dup 601 into 1's component
    kept_c = {r["doc_id"] for r in
              dedup_ops.dedup_corpus(docs, method="components")
              .select("doc_id").collect()}
    assert 0 in kept_c and 1 in kept_c
    assert 600 not in kept_c and 601 not in kept_c
    with pytest.raises(ValueError, match="unknown dedup method"):
        dedup_ops.dedup_corpus(docs, method="nope")


def test_exact_duplicates_huge_group_is_spillable(spark):
    """A planted 10^5-member duplicate group must complete and must NOT
    plan a per-group collect_list array (the construct that OOMs a
    single aggregation task at corpus scale)."""
    n = 100_000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < n - 10, F.lit("the same boilerplate text"))
        .otherwise(F.concat(F.lit("unique "), F.col("id").cast("string")))
        .alias("text"),
    )
    out = dedup_ops.exact_duplicates(df)
    assert "collect_list" not in out._jdf.queryExecution().executedPlan().toString()
    agg = out.agg(
        F.count(F.lit(1)).alias("members"),
        F.countDistinct("fp").alias("groups"),
        F.min("keep_id").alias("keep"),
    ).collect()[0]
    assert agg["members"] == n - 10
    assert agg["groups"] == 1
    assert agg["keep"] == 0


def test_minhash_lsh_finds_near_dup(spark, docs):
    cand = dedup_ops.minhash_lsh_candidates(docs, num_hashes=32, bands=8)
    pairs = {(r["id_a"], r["id_b"]) for r in cand.collect()}
    assert (1, 601) in pairs and (0, 600) in pairs
    verified = dedup_ops.ngram_jaccard_pairs(docs, cand, n=3, threshold=0.5).collect()
    vpairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in verified}
    assert vpairs.get((1, 601), 0) >= 0.5
    # candidate set is far smaller than all-pairs (LSH is doing work)
    n = docs.count()
    assert cand.count() < n * (n - 1) / 8


def test_simhash_near_duplicates(spark, docs):
    got = dedup_ops.simhash_near_duplicates(docs, max_hamming=10)
    pairs = {(r["id_a"], r["id_b"]) for r in got.collect()}
    assert (1, 601) in pairs


def test_duplicate_components_chain_and_clique(spark):
    """Min-label propagation: a 4-node chain (diameter 3 — needs >1
    iteration), a triangle, and an isolated pair all resolve to the
    component minimum as keep_id."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),      # chain 1-2-3-4
         (10, 11), (11, 12), (10, 12),  # triangle
         (20, 21)],                     # pair
        "id_a long, id_b long",
    )
    got = {r["doc_id"]: r["keep_id"] for r in dedup_ops.duplicate_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_duplicate_components_nonconvergence_raises(spark):
    """Partial labels must never be returned silently (round-2
    advisory): a chain whose diameter exceeds max_iterations raises."""
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup_ops.duplicate_components(chain, max_iterations=3)


def test_duplicate_components_star_chain(spark):
    """Big-star/small-star converges in O(log n) rounds on a chain
    whose diameter would need ~n label-propagation rounds, and its
    output equals the label-propagation baseline."""
    n = 64
    chain = [(i, i + 1) for i in range(n)]             # diameter 64
    extra = [(100, 101), (101, 102), (100, 102), (200, 201)]
    pairs = spark.createDataFrame(chain + extra, "id_a long, id_b long")
    got = {
        r["doc_id"]: r["keep_id"]
        for r in dedup_ops.duplicate_components_star(pairs, max_iterations=12).collect()
    }
    want = {i: 0 for i in range(n + 1)}
    want.update({100: 100, 101: 100, 102: 100, 200: 200, 201: 200})
    assert got == want
    # baseline equality on a shape it can still converge on
    small = spark.createDataFrame(chain[:8] + extra, "id_a long, id_b long")
    lp = {r["doc_id"]: r["keep_id"] for r in dedup_ops.duplicate_components(small).collect()}
    st = {r["doc_id"]: r["keep_id"] for r in dedup_ops.duplicate_components_star(small).collect()}
    assert lp == st


def test_ngram_jaccard_no_forced_broadcast(spark, docs):
    """The candidate id set is not bounded at corpus scale — the
    semi-join must survive without a forced broadcast hint (AQE may
    still CHOOSE broadcast; what's banned is the unconditional hint
    that OOMs when the candidate set is huge). Checked on the
    optimized logical plan: no ResolvedHint remains."""
    cand = dedup_ops.minhash_lsh_candidates(docs, num_hashes=32, bands=8)
    verified = dedup_ops.ngram_jaccard_pairs(docs, cand, n=3, threshold=0.5)
    logical = verified._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in logical and "UnresolvedHint" not in logical
    assert (1, 601) in {(r["id_a"], r["id_b"]) for r in verified.collect()}


def test_simhash_deterministic_golden(spark):
    """Signatures are JVM-xxhash64-derived: identical across processes,
    executors and replays. Golden values pin cross-run stability (the
    round-1 implementation used per-process-seeded Python hash() and
    would fail this on any PYTHONHASHSEED change)."""
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs"),
        ],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r["simhash"] for r in dedup_ops.simhash(df).collect()}
    assert got == {1: -7573889167326994222, 2: 2495353224988115078}


def test_embedding_near_dup_lsh_route(spark):
    """The scale path: planted twin found through LSH candidates, and
    the plan contains no cartesian/nested-loop product."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    first = emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    twin = spark.createDataFrame([(900, [float(x) for x in first], 99)], emb.schema)
    vecs = emb.unionByName(twin)
    nd = dedup_ops.embedding_near_duplicates(vecs, threshold=0.999, mode="lsh")
    plan = nd._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert {(r["id_a"], r["id_b"]) for r in nd.collect()} == {(0, 900)}


def test_embedding_near_dup_auto_routes_by_size(spark):
    """auto mode: small inputs take the exact form; the threshold
    constant guards the public entry against accidental O(n²)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(50)
    out = dedup_ops.embedding_near_duplicates(emb, threshold=0.999, mode="auto")
    assert out.count() == 0  # no dups among 50 random vectors
    assert dedup_ops.BRUTE_FORCE_LIMIT <= 100_000


def test_embedding_near_duplicates_and_ann(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    first = emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    twin = spark.createDataFrame([(900, [float(x) for x in first], 99)], emb.schema)
    vecs = emb.unionByName(twin)

    nd = dedup_ops.embedding_near_duplicates(vecs.where(F.col("vec_id").isin(0, 1, 2, 900)), threshold=0.999)
    assert {(r["id_a"], r["id_b"]) for r in nd.collect()} == {(0, 900)}

    queries = vecs.where(F.col("vec_id") == 900).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = ann.cosine_topk(vecs, queries, k=3)
    top1 = exact.where(F.col("rank") == 1).collect()[0]
    assert top1["vec_id"] == 0 and top1["cosine"] > 0.9999

    approx = ann.ann_topk_lsh(vecs, queries, dim=64, k=3, bits=6, tables=4)
    # an identical vector always shares every LSH bucket → rank 1 found
    a1 = approx.where(F.col("rank") == 1).collect()[0]
    assert a1["vec_id"] == 0


def test_ann_lsh_recall(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 8).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = {(r["query_id"], r["vec_id"]) for r in ann.cosine_topk(emb, queries, k=5).collect()}
    approx = {
        (r["query_id"], r["vec_id"])
        for r in ann.ann_topk_lsh(emb, queries, dim=64, k=5, bits=4, tables=12).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"LSH recall degenerate: {recall}"


def test_ann_lsh_dim768_scale(spark):
    """Production-dim check: 20k vectors × dim 768 with planted
    clusters. The signature path is one numpy matmul per Arrow batch
    (the round-1 literal-array plane encoding built dim×bits×tables
    Catalyst literals — ~61k nodes at this shape — and died in
    analysis). Recall ≥ 0.9 vs a numpy brute-force oracle, and the
    whole thing finishes in seconds."""
    import time

    import numpy as np
    import pandas as pd

    dim, n_clusters, per_cluster, k = 768, 20, 1000, 5
    rng = np.random.default_rng(7)
    base = rng.standard_normal((n_clusters, dim))
    noise = rng.standard_normal((n_clusters * per_cluster, dim)) * 0.15
    M = np.repeat(base, per_cluster, axis=0) + noise  # (20k, dim)
    ids = np.arange(len(M))
    pdf = pd.DataFrame({"vec_id": ids, "embedding": [row.tolist() for row in M]})
    vecs = spark.createDataFrame(pdf)

    q_ids = [0, 1000, 5000, 12000, 19999]
    # exact top-k oracle in numpy (cosine, excluding self)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    exact = set()
    for qid in q_ids:
        sims = Mn @ Mn[qid]
        sims[qid] = -np.inf
        top = np.argpartition(-sims, k)[:k]
        exact |= {(qid, int(v)) for v in top}

    queries = vecs.where(F.col("vec_id").isin(q_ids)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    t0 = time.monotonic()
    approx = ann.ann_topk_lsh(vecs, queries, dim=dim, k=k, bits=10, tables=8)
    got = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    elapsed = time.monotonic() - t0
    recall = len(exact & got) / len(exact)
    assert recall >= 0.9, f"recall {recall} at dim 768"
    assert elapsed < 120, f"ANN LSH at dim 768 took {elapsed:.0f}s"


def test_ann_ivf_recall_on_clustered_data(spark):
    """IVF coarse quantizer: on clustered embeddings (IVF's habitat —
    near-orthogonal uniform noise spreads true neighbours across lists
    by construction, which is what LSH multi-tables are for) the probed
    lists must contain ≥0.9 of the exact top-k. Deterministic: centroid
    training is seeded and samples by hash order, no execution-time
    RNG."""
    import numpy as np
    import pandas as pd

    dim, n_clusters, per_cluster, k = 128, 10, 500, 5
    rng = np.random.default_rng(11)
    base = rng.standard_normal((n_clusters, dim))
    M = np.repeat(base, per_cluster, axis=0) + rng.standard_normal(
        (n_clusters * per_cluster, dim)
    ) * 0.2
    pdf = pd.DataFrame(
        {"vec_id": np.arange(len(M)), "embedding": [r.tolist() for r in M]}
    )
    vecs = spark.createDataFrame(pdf)
    q_ids = [0, 900, 2500, 4999]
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    exact = set()
    for qid in q_ids:
        sims = Mn @ Mn[qid]
        sims[qid] = -np.inf
        exact |= {(qid, int(v)) for v in np.argpartition(-sims, k)[:k]}
    queries = vecs.where(F.col("vec_id").isin(q_ids)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx = ann.ann_topk_ivf(
        vecs, queries, dim=dim, k=k, n_lists=16, nprobe=3, sample_size=2000
    )
    got = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(exact & got) / len(exact)
    assert recall >= 0.9, f"IVF recall {recall}"
    # reusing a trained index skips retraining and gives identical results
    cent = ann.train_ivf_centroids(vecs, dim=dim, n_lists=16, sample_size=2000)
    again = {
        (r["query_id"], r["vec_id"])
        for r in ann.ann_topk_ivf(
            vecs, queries, dim=dim, k=k, n_lists=16, nprobe=3, centroids=cent
        ).collect()
    }
    assert again == got


def test_multimodal_plumbing(spark):
    media = multimodal.generate_media_fixture(spark, n=60)
    feats = multimodal.extract_features(media)
    rows = feats.collect()
    assert len(rows) == 60
    assert all(r["n_bytes"] == 32 and len(r["features"]) == multimodal.FEATURE_DIM for r in rows)
    # deterministic across runs
    again = {r["media_id"]: r["sha256"] for r in multimodal.extract_features(media).collect()}
    assert all(again[r["media_id"]] == r["sha256"] for r in rows)
    # 'real' mode no longer raises: undecodable digest-noise blobs get
    # features=None instead of failing the stage
    real = multimodal.extract_features(media, decode_fn="real").collect()
    assert len(real) == 60 and all(r["features"] is None for r in real)


def test_multimodal_real_decode(spark):
    """Pure-numpy codecs recover the generation parameters exactly from
    the actual bytes: PNM geometry + mean pixel, WAV rate/duration/RMS,
    and content-derived feature vectors."""
    media = multimodal.generate_decodable_media_fixture(spark, n=90)
    rows = {r["media_id"]: r for r in multimodal.decode_media(media).collect()}
    assert len(rows) == 90
    for mid, r in rows.items():
        assert r["decode_error"] is None, (mid, r["decode_error"])
        m = mid % 3
        if m == 1:
            amp = mid % 10000
            assert r["format"] == "wav" and r["sample_rate"] == 8000
            assert r["n_samples"] == 400 * (1 + mid % 5)
            assert r["duration_ms"] == 50 * (1 + mid % 5)
            assert r["mean_value"] == float(amp)  # exact for constant fill
            assert all(abs(f - amp / 32768.0) < 1e-6 for f in r["features"])
        else:
            v = mid % 251
            assert r["format"] == ("ppm" if m == 0 else "pgm")
            assert (r["width"], r["height"]) == (4 + mid % 13, 3 + mid % 7)
            assert r["channels"] == (3 if m == 0 else 1)
            assert r["mean_value"] == float(v)
            assert all(abs(f - v / 255.0) < 1e-6 for f in r["features"])
        assert len(r["features"]) == multimodal.FEATURE_DIM
    # extract_features('real') produces content features for decodables
    feats = {r["media_id"]: r for r in
             multimodal.extract_features(media, decode_fn="real").collect()}
    assert all(f["features"] is not None for f in feats.values())


def test_multimodal_decode_malformed_is_per_row(spark):
    """One truncated image and one non-PCM blob must surface as
    decode_error rows, not a failed Spark stage."""
    import pandas as pd

    good = b"P5\n2 2\n255\n" + bytes([7]) * 4
    bad_trunc = b"P6\n100 100\n255\n" + b"\x00" * 10  # raster too short
    bad_fmt = b"garbage-not-a-media-file"
    pdf = pd.DataFrame({
        "media_id": [1, 2, 3],
        "kind": ["image", "image", "video"],
        "payload": [good, bad_trunc, bad_fmt],
        "meta": [None, None, None],
    })
    media = spark.createDataFrame(pdf, multimodal.MEDIA_SCHEMA)
    rows = {r["media_id"]: r for r in multimodal.decode_media(media).collect()}
    assert rows[1]["decode_error"] is None and rows[1]["mean_value"] == 7.0
    assert "truncated" in rows[2]["decode_error"]
    assert "unsupported" in rows[3]["decode_error"]
    assert rows[2]["features"] is None and rows[3]["features"] is None


def test_wav_roundtrip(spark):
    """wav_bytes → _parse_wav round-trips arbitrary int16 content."""
    import numpy as np

    sig = (np.sin(np.linspace(0, 40, 1600)) * 12000).astype("<i2")
    blob = multimodal.wav_bytes(16000, sig)
    n_ch, sr, back = multimodal._parse_wav(blob)
    assert (n_ch, sr) == (1, 16000)
    assert np.array_equal(back, sig)


def test_generate_embeddings_deterministic_and_clustered(spark):
    """The production-dim bench fixture: identical across runs (hash-
    derived, no RNG at execution time) and genuinely clustered (intra-
    cluster cosine ≫ inter-cluster) so it exercises ANN's habitat."""
    import numpy as np

    from spark_cdc.sources.changelog import generate_embeddings

    a = generate_embeddings(spark, 120, dim=48, n_clusters=6).collect()
    b = generate_embeddings(spark, 120, dim=48, n_clusters=6).collect()
    assert sorted((r["vec_id"], tuple(r["embedding"])) for r in a) == sorted(
        (r["vec_id"], tuple(r["embedding"])) for r in b
    )
    M = np.array([r["embedding"] for r in sorted(a, key=lambda r: r["vec_id"])])
    lab = np.array([r["label"] for r in sorted(a, key=lambda r: r["vec_id"])])
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    sims = Mn @ Mn.T
    same = lab[:, None] == lab[None, :]
    off_diag = ~np.eye(len(M), dtype=bool)
    intra = sims[same & off_diag].mean()
    inter = sims[~same].mean()
    assert intra > 0.8 and abs(inter) < 0.3, (intra, inter)


def test_ann_ivf_partitioned_layout_prunes_and_matches(spark, tmp_path):
    """The at-scale IVF layout: vectors stored partitioned by list_id;
    a probe reads ONLY the queried lists (PartitionFilters in the scan
    — plan-asserted) and returns exactly what the in-memory equi-join
    form returns with the same trained index."""
    import numpy as np
    import pandas as pd

    dim, n_clusters, per_cluster = 64, 10, 80
    rng = np.random.default_rng(5)
    base = rng.standard_normal((n_clusters, dim))
    M = np.repeat(base, per_cluster, axis=0) + 0.1 * rng.standard_normal(
        (n_clusters * per_cluster, dim)
    )
    vecs = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(len(M)), "embedding": [r.tolist() for r in M]})
    )
    queries = vecs.where(F.col("vec_id").isin(0, 100, 500)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cent = ann.train_ivf_centroids(vecs, dim=dim, n_lists=10, sample_size=800)
    path = str(tmp_path / "ivf")
    ann.ivf_write_partitioned(vecs, path, cent)

    got = ann.ann_topk_ivf_partitioned(spark, path, queries, cent, k=5, nprobe=3)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "list_id" in plan, plan

    want = ann.ann_topk_ivf(
        vecs, queries, dim=dim, k=5, n_lists=10, nprobe=3,
        sample_size=800, centroids=cent,
    )
    a = sorted(tuple(r) for r in got.select("query_id", "rank", "vec_id").collect())
    b = sorted(tuple(r) for r in want.select("query_id", "rank", "vec_id").collect())
    assert a == b
    # pruning is real: fewer partition dirs scanned than exist
    import re
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "list_id" in m.group(1), plan


def test_hash_split_deterministic_and_accurate(spark):
    from pyspark.sql import functions as F

    from spark_cdc.operators.sampling import hash_split, split_thresholds

    assert split_thresholds({"train": 0.8, "val": 0.1, "test": 0.1}) == [
        ("train", "cccc"), ("val", "e666"), ("test", None),
    ]
    ids = spark.range(20_000).withColumnRenamed("id", "doc_id")
    split = hash_split(ids, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in
              split.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert abs(counts["train"] / 20_000 - 0.8) < 0.02
    assert abs(counts["val"] / 20_000 - 0.1) < 0.01
    assert abs(counts["test"] / 20_000 - 0.1) < 0.01
    # growth stability: assignments of the first 5k keys are unchanged
    # when the corpus is 4x larger (pure function of the key)
    small = hash_split(spark.range(5_000).withColumnRenamed("id", "doc_id"),
                       "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    joined = small.alias("s").join(split.alias("b"), "doc_id").where(
        F.col("s.split") != F.col("b.split")).count()
    assert joined == 0


def test_hash_split_null_keys_are_visible(spark):
    """md5(NULL) is NULL, so without an explicit guard a null-key row
    falls through every WHEN into the LAST split — silently polluting
    the eval set. Nulls must surface as NULL (or a named quarantine
    split), never fold into 'test'."""
    from pyspark.sql import functions as F

    from spark_cdc.operators.sampling import hash_split

    df = spark.createDataFrame(
        [(1,), (2,), (None,)], "doc_id int"
    )
    got = {r["doc_id"]: r["split"] for r in hash_split(
        df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    assert got[None] is None
    assert got[1] is not None and got[2] is not None
    named = hash_split(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1},
                       null_split="quarantine")
    assert {r["split"] for r in named.where(F.col("doc_id").isNull()).collect()} \
        == {"quarantine"}


def test_ann_pq_equals_exact_and_deterministic(spark):
    """PQ shortlist + exact re-rank equals brute force at the tuned
    depth; codebooks/codes are replay-stable (no execution-time RNG);
    the code table is the skinny m·int16 shape."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding")
    exact = {(r["query_id"], r["rank"]): r["vec_id"]
             for r in ann.cosine_topk(emb, queries, k=5, score_arrow=False).collect()}
    got = ann.ann_topk_pq(emb, queries, dim=64, k=5, m=16, n_codes=128,
                          shortlist=128, score_arrow=False)
    pq = {(r["query_id"], r["rank"]): r["vec_id"] for r in got.collect()}
    assert pq == exact
    # determinism: same codebooks twice
    import numpy as np
    b1 = ann.train_pq_codebooks(emb, dim=64, m=16, n_codes=128)
    b2 = ann.train_pq_codebooks(emb, dim=64, m=16, n_codes=128)
    assert np.array_equal(b1, b2)
    codes = emb.select(
        ann.pq_encode_udf(b1)(F.col("embedding").cast("array<double>")).alias("c")
    ).first()["c"]
    assert len(codes) == 16 and all(0 <= c < 128 for c in codes)


def test_ann_pq_dim768_clustered(spark):
    """PQ at production dim on the clustered fixture: equals exact
    top-k once the shortlist exceeds the cluster size (ADC ties across
    a quantization-collided cluster are resolved by the exact re-rank,
    not by luck), with a reused trained index."""
    from spark_cdc.sources.changelog import generate_embeddings

    vecs = generate_embeddings(spark, n_vectors=10_000, dim=768, n_clusters=32).cache()
    try:
        queries = vecs.where(F.col("vec_id") % 2500 == 0).select(
            F.col("vec_id").alias("query_id"), "embedding")
        exact = {(r["query_id"], r["rank"]): r["vec_id"]
                 for r in ann.cosine_topk(vecs, queries, k=5, score_arrow=True).collect()}
        books = ann.train_pq_codebooks(vecs, dim=768, m=16, n_codes=256,
                                       sample_size=4000)
        got = ann.ann_topk_pq(vecs, queries, dim=768, k=5, m=16, n_codes=256,
                              shortlist=500, codebooks=books)
        pq = {(r["query_id"], r["rank"]): r["vec_id"] for r in got.collect()}
        assert pq == exact
    finally:
        vecs.unpersist()


def test_ann_ivfpq_clustered_equals_exact(spark):
    """IVF+PQ on the d768 clustered fixture: routing + ADC + exact
    re-rank equals brute force when nprobe covers the query's cluster
    and the shortlist covers probed-cell survivors."""
    from spark_cdc.sources.changelog import generate_embeddings

    vecs = generate_embeddings(spark, n_vectors=6_000, dim=768, n_clusters=16).cache()
    try:
        queries = vecs.where(F.col("vec_id") % 1500 == 0).select(
            F.col("vec_id").alias("query_id"), "embedding")
        exact = {(r["query_id"], r["rank"]): r["vec_id"]
                 for r in ann.cosine_topk(vecs, queries, k=5, score_arrow=True).collect()}
        got = ann.ann_topk_ivfpq(
            vecs, queries, dim=768, k=5, n_lists=16, nprobe=2,
            m=16, n_codes=256, shortlist=500, sample_size=3000)
        pq = {(r["query_id"], r["rank"]): r["vec_id"] for r in got.collect()}
        assert pq == exact
    finally:
        vecs.unpersist()


def test_ann_ivfpq_partitioned_layout(spark, tmp_path):
    """The at-scale IVF+PQ serving layout: codes-only index partitioned
    by list_id; a probe reads only probed partitions (PartitionFilters
    plan-asserted), ADC shortlists, exact re-rank from the raw table —
    and equals the in-memory ann_topk_ivfpq with the same index."""
    import numpy as np
    import pandas as pd

    dim, n_clusters, per_cluster = 64, 10, 80
    rng = np.random.default_rng(5)
    base = rng.standard_normal((n_clusters, dim))
    M = np.repeat(base, per_cluster, axis=0) + 0.1 * rng.standard_normal(
        (n_clusters * per_cluster, dim)
    )
    vecs = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(len(M)), "embedding": [r.tolist() for r in M]})
    )
    queries = vecs.where(F.col("vec_id").isin(0, 100, 500)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cent = ann.train_ivf_centroids(vecs, dim=dim, n_lists=10, sample_size=800)
    books = ann.train_pq_codebooks(vecs, dim=dim, m=16, n_codes=64, sample_size=800)
    path = str(tmp_path / "ivfpq")
    ann.ivfpq_write_partitioned(vecs, path, cent, books)

    got = ann.ann_topk_ivfpq_partitioned(
        spark, path, vecs, queries, cent, books, k=5, nprobe=3, shortlist=120)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "list_id" in plan, plan

    want = ann.ann_topk_ivfpq(
        vecs, queries, dim=dim, k=5, n_lists=10, nprobe=3, m=16, n_codes=64,
        shortlist=120, sample_size=800, centroids=cent, codebooks=books)
    a = sorted(tuple(r) for r in got.select("query_id", "rank", "vec_id").collect())
    b = sorted(tuple(r) for r in want.select("query_id", "rank", "vec_id").collect())
    assert a == b
    # the index rows really are skinny: no raw embedding column stored
    stored = spark.read.parquet(path)
    assert set(stored.columns) == {"vec_id", "codes", "list_id"}


def test_contamination_check(spark, docs):
    """Planted contamination: an eval doc lifted verbatim from doc 0
    flags doc 0 (and its exact dup 600); an eval doc of novel text
    flags nothing."""
    ev = spark.createDataFrame(
        [(900, docs.where(F.col("doc_id") == 0).first()["text"]),
         (901, "entirely novel words never appearing in the corpus fixture zzz qqq"
               " xxw yyv uut ssr rrq ppn")],
        "eval_id long, text string",
    )
    hits = dedup_ops.contamination_check(docs, ev, n=8)
    got = {(r["doc_id"], r["eval_id"]) for r in hits.collect()}
    assert (0, 900) in got and (600, 900) in got
    assert not any(e == 901 for _, e in got)
    # scrub: anti-join removes exactly the flagged docs
    dirty = hits.select("doc_id").distinct()
    clean = docs.join(dirty, "doc_id", "left_anti")
    assert clean.count() == docs.count() - dirty.count()


def test_chunk_documents(spark):
    """Chunk boundaries: overlap shared between consecutive chunks,
    short docs give one chunk, token counts exact, round-trip of the
    token stream (non-overlapped part) preserved."""
    from spark_cdc.operators.sampling import chunk_documents

    words = " ".join(f"w{i}" for i in range(100))
    df = spark.createDataFrame(
        [(1, words), (2, "tiny doc"), (3, "   spaced   out   doc  ")],
        "doc_id long, text string",
    )
    rows = {(r["doc_id"], r["chunk_idx"]): r
            for r in chunk_documents(df, chunk_tokens=40, overlap=10).collect()}
    # doc 1: 100 tokens, stride 30 -> ceil(90/30)=3 chunks
    assert {i for d, i in rows if d == 1} == {0, 1, 2}
    c0, c1 = rows[(1, 0)], rows[(1, 1)]
    assert c0["n_tokens"] == 40 and c0["chunk_text"].split()[0] == "w0"
    # overlap: last 10 tokens of chunk 0 == first 10 of chunk 1
    assert c0["chunk_text"].split()[30:] == c1["chunk_text"].split()[:10]
    # short docs: single whole chunk; whitespace collapsed
    assert rows[(2, 0)]["chunk_text"] == "tiny doc"
    assert rows[(3, 0)]["chunk_text"] == "spaced out doc"
    import pytest

    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_tokens=10, overlap=10)


def test_pack_chunks(spark):
    """Sample packing: every chunk assigned once, bin capacity
    respected (oversized chunks isolated), decent fill factor, and
    deterministic across runs."""
    from spark_cdc.operators.sampling import chunk_documents, pack_chunks

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range((i * 37) % 300 + 5)))
         for i in range(200)],
        "doc_id long, text string",
    )
    chunks = chunk_documents(docs, chunk_tokens=128)
    packed = pack_chunks(chunks, max_tokens=256, n_buckets=4).cache()
    try:
        assert packed.count() == chunks.count()  # nothing lost or duplicated
        assert packed.select("doc_id", "chunk_idx").distinct().count() == chunks.count()
        bins = packed.groupBy("pack_bucket", "pack_idx").agg(
            F.sum("n_tokens").alias("fill"), F.count(F.lit(1)).alias("members"))
        over = bins.where((F.col("fill") > 256) & (F.col("members") > 1)).count()
        assert over == 0  # capacity violated only by singleton oversized chunks
        stats = bins.agg(F.sum("fill").alias("tok"), F.count(F.lit(1)).alias("nb")).first()
        assert stats["tok"] / (stats["nb"] * 256) > 0.7  # FFD actually packs
        again = pack_chunks(chunks, max_tokens=256, n_buckets=4)
        assert packed.exceptAll(again).count() == 0
    finally:
        packed.unpersist()
