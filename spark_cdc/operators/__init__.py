"""spark_cdc.operators — analytics + training-data operators.

- kpi: the reference's five materialized KPI views (SURVEY.md §2.6)
  re-expressed as recompute-on-read Spark plans
- dedup_ops: exact / MinHash-LSH / SimHash / n-gram-Jaccard /
  embedding-cosine near-duplicate detection
- ann: brute-force + LSH-bucketed approximate nearest neighbours
- multimodal: binary-column decode/feature plumbing (decode stubbed —
  codec libs absent in this environment)
"""
