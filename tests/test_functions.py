"""Parser column expressions vs the reference's per-row parser edge
cases (FIXTURES.md F5; reference tests/test_stream_etl.py:148-202),
plus the Arrow-vectorized text normalization UDF."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from spark_cdc.functions import (
    ensure_date,
    normalize_text,
    parse_numeric_tolerant,
    parse_timestamp_any,
)
from spark_cdc.functions.text import lang_id, quality_score, token_count


def _apply(spark, values, expr_fn, in_type="string"):
    df = spark.createDataFrame([(v,) for v in values], f"v {in_type}")
    return [r["out"] for r in df.select(expr_fn(F.col("v")).alias("out")).collect()]


def test_parse_numeric_tolerant(spark):
    # reference cases processor.py:41-68 / tests :148-163 — except the
    # 1.0 fallback: 'invalid' must be null (dead-letter policy)
    got = _apply(spark, ["42", "3.14", "2.5", "$3.99", "1,200.50", "invalid", "", None],
                 parse_numeric_tolerant)
    assert got == [42.0, 3.14, 2.5, 3.99, 1200.50, None, None, None]


def test_parse_timestamp_formats(spark):
    # reference formats processor.py:70-141 / tests :165-202
    cases = {
        "2024-03-05T10:11:12Z": datetime.datetime(2024, 3, 5, 10, 11, 12),
        "2024-03-05T10:11:12": datetime.datetime(2024, 3, 5, 10, 11, 12),
        "2024-03-05": datetime.datetime(2024, 3, 5),
        "2024/03/05": datetime.datetime(2024, 3, 5),
        "05-03-2024": datetime.datetime(2024, 3, 5),
        "garbage": None,
        None: None,
    }
    got = _apply(spark, list(cases), parse_timestamp_any)
    assert got == list(cases.values())


def test_parse_timestamp_epoch_magnitudes(spark):
    t = datetime.datetime(2024, 3, 5, 10, 11, 12)
    epoch = int(t.replace(tzinfo=datetime.timezone.utc).timestamp())
    got = _apply(spark, [str(epoch), str(epoch * 1000), str(epoch * 1_000_000)],
                 parse_timestamp_any)
    assert got == [t, t, t]


def test_ensure_date(spark):
    got = _apply(spark, ["2024-03-05T10:11:12", "bad"], ensure_date)
    assert got == [datetime.date(2024, 3, 5), None]


def test_normalize_text_udf(spark):
    got = _apply(spark, ["  hello\t\n  world  ", "café", None], normalize_text)
    assert got[0] == "hello world"
    assert got[1] == "café"  # NFC composed
    assert got[2] is None


def test_token_count_and_quality(spark):
    got = _apply(spark, ["one two three", "", None, "  padded  words  "], token_count)
    assert got == [3, 0, 0, 2]
    q = _apply(spark, ["a good clean english sentence with words", "!!!###$$$"], quality_score)
    assert 0 <= q[1] < q[0] <= 1


def test_lang_id_markers(spark):
    got = _apply(
        spark,
        [
            "the cat and the dog is you",
            "el gato que de los perros",
            "der hund ist nicht die katze und",
            "xyzzy qwerty",
        ],
        lang_id,
    )
    assert got == ["en", "es", "de", "und"]


def test_bm25_search(spark):
    """BM25: rarer terms dominate, higher tf raises score (sublinearly),
    index reuse equals from-scratch, top-k deterministic."""
    from spark_cdc.operators.search import bm25_index, bm25_scores, bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "spark merges data fast"),
            (2, "spark spark spark everywhere"),
            (3, "unrelated text about cats"),
            (4, "merges and more merges of data"),
        ],
        "doc_id long, text string",
    )
    scores = {r["doc_id"]: r["score"] for r in
              bm25_scores(docs, "spark merges").collect()}
    assert set(scores) == {1, 2, 4}  # doc 3 matches nothing
    # doc 1 hits BOTH terms -> beats single-term docs
    assert scores[1] > scores[2] and scores[1] > scores[4]
    top = bm25_topk(docs, "spark merges", k=2).collect()
    assert [r["doc_id"] for r in top] == [1, max(
        (2, 4), key=lambda d: scores[d])]
    # prebuilt-index path equals from-scratch
    idx = bm25_index(docs)
    again = {r["doc_id"]: r["score"] for r in
             bm25_scores(docs, "spark merges", index=idx).collect()}
    assert again == scores
    import pytest

    with pytest.raises(ValueError, match="empty query"):
        bm25_scores(docs, "   ")
