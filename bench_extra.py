#!/usr/bin/env python
"""Supplementary benchmarks for the optimization round (guide §1.4).

``bench.py`` is frozen for measurement; this file holds the isolation
harness used to attribute time inside the composite entries:

- ``--queries``: each declared bench query timed against the noop sink
  (computation only, no collect/driver transfer), best of N.
- ``--ann-build``: the ann_ivfpq_d768 index build split into phases
  (IVF sample+train, PQ sample+train, encode+write).
- ``--lsh-d768``: the d768 LSH probe, phases (signatures, candidates,
  re-join+score).
- ``--replay``: one MoR micro-batch with per-phase engine timings.

Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 python bench_extra.py --queries
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spark_cdc.session import get_spark  # noqa: E402


def noop(df) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return round(time.monotonic() - t0, 3)


def best_of(fn, n=2):
    return min(fn() for _ in range(n))


def run_queries(spark, sf_dir, names=None, repeats=2):
    from spark_cdc.plans import QUERIES
    from bench import BENCH_QUERIES

    out = {}
    for name in names or BENCH_QUERIES:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        out[name] = best_of(lambda: noop(QUERIES[name](spark, sf_dir)), repeats)
        print(name, out[name], flush=True)
    spark.sparkContext.setJobDescription(None)
    return out


def run_ann_build(spark):
    import numpy as np  # noqa: F401
    from pyspark.sql import functions as F

    from spark_cdc.operators import ann
    from spark_cdc.sources.changelog import generate_embeddings

    n, dim = 100_000, 768
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    path = os.path.join(base, f"spark_cdc_bench_emb_{n}x{dim}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        generate_embeddings(spark, n_vectors=n, dim=dim, n_clusters=64).write.mode(
            "overwrite"
        ).parquet(path)
    vecs = spark.read.parquet(path)
    vecs.count()  # warm scan
    out = {}
    t0 = time.monotonic()
    centroids = ann.train_ivf_centroids(vecs, dim, n_lists=64, seed=42,
                                        sample_size=10_000)
    out["ivf_train_sec"] = round(time.monotonic() - t0, 3)
    t0 = time.monotonic()
    codebooks = ann.train_pq_codebooks(vecs, dim, m=48, n_codes=256, seed=42,
                                       sample_size=10_000)
    out["pq_train_sec"] = round(time.monotonic() - t0, 3)
    idx_path = os.path.join(base, "spark_cdc_extra_ivfpq")
    t0 = time.monotonic()
    ann.ivfpq_write_partitioned(vecs, idx_path, centroids, codebooks)
    out["encode_write_sec"] = round(time.monotonic() - t0, 3)
    out["build_total_sec"] = round(
        out["ivf_train_sec"] + out["pq_train_sec"] + out["encode_write_sec"], 3
    )
    # probe
    queries = vecs.where(F.col("vec_id") % 6250 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    ann.ann_topk_ivfpq_partitioned(
        spark, idx_path, vecs, queries.limit(2), centroids, codebooks,
        k=5, nprobe=8, shortlist=200,
    ).collect()
    t0 = time.monotonic()
    ann.ann_topk_ivfpq_partitioned(
        spark, idx_path, vecs, queries, centroids, codebooks,
        k=5, nprobe=8, shortlist=200,
    ).collect()
    out["ivfpq_probe_sec"] = round(time.monotonic() - t0, 3)
    return out


def run_lsh_d768(spark):
    from pyspark.sql import functions as F

    from spark_cdc.operators import ann

    n, dim = 100_000, 768
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    path = os.path.join(base, f"spark_cdc_bench_emb_{n}x{dim}")
    vecs = spark.read.parquet(path)
    queries = vecs.where(F.col("vec_id") % 6250 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    vecs.count()
    ann.ann_topk_lsh(vecs.limit(2000), queries.limit(2), dim=dim, k=5, bits=10,
                     tables=8).collect()
    out = {}
    # phase: signatures only
    sig = ann.hyperplane_lsh_buckets(vecs, dim, 10, 42, 8).select(
        "vec_id", "tbl", "bucket"
    )
    out["signatures_sec"] = best_of(lambda: noop(sig))
    t0 = time.monotonic()
    ann.ann_topk_lsh(vecs, queries, dim=dim, k=5, bits=10, tables=8).collect()
    out["lsh_total_sec"] = round(time.monotonic() - t0, 3)
    return out


def run_dedup_phases(spark):
    from pyspark.sql import functions as F

    from spark_cdc.operators import dedup_ops

    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    path = os.path.join(base, "spark_cdc_bench_docs_100000")
    docs = spark.read.parquet(path)
    docs.count()
    dedup_ops.minhash_lsh_candidates(docs.limit(2000), num_hashes=64, bands=8).count()
    out = {}
    sig = docs.select(
        dedup_ops.text_minhash_np(64, 5)(F.lower(F.col("text"))).alias("s")
    )
    out["signatures_sec"] = best_of(lambda: noop(sig))
    t0 = time.monotonic()
    cand = dedup_ops.minhash_lsh_candidates(docs, num_hashes=64, bands=8).persist()
    pairs = dedup_ops.ngram_jaccard_pairs(docs, cand, n=3, threshold=0.5)
    pairs.count()
    cand.unpersist()
    out["dedup_minhash_100k_sec"] = round(time.monotonic() - t0, 3)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", action="store_true")
    ap.add_argument("--names", type=str, default=None)
    ap.add_argument("--ann-build", action="store_true")
    ap.add_argument("--lsh-d768", action="store_true")
    ap.add_argument("--dedup", action="store_true")
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(master=f"local[{cores}]", app_name="bench_extra",
                      shuffle_partitions=max(cores, 8))
    out = {}
    if args.queries or args.names:
        names = args.names.split(",") if args.names else None
        out["queries"] = run_queries(spark, sf_dir, names, args.repeats)
    if args.ann_build:
        out["ann_build"] = run_ann_build(spark)
    if args.lsh_d768:
        out["lsh_d768"] = run_lsh_d768(spark)
    if args.dedup:
        out["dedup"] = run_dedup_phases(spark)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
