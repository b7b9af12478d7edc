"""SFT example assembly: the one-window-pass Spark rendering equals a
straightforward per-conversation reference implementation, including
whole-turn budget truncation, last-only mode, null text, and
zero-token boundary turns."""

from __future__ import annotations

import random
from collections import defaultdict

from spark_cdc.operators.examples import sft_examples

TURNS_SCHEMA = "conv_id string, turn_idx int, role string, text string"


def _ntok(text):
    return len(text.split()) if text and text.strip() else 0


def _ref(rows, budget=None, target="assistant", last_only=False,
         min_ctx=1, sep="\n"):
    byconv = defaultdict(list)
    for r in rows:
        byconv[r[0]].append(r)
    out = []
    for conv, rs in byconv.items():
        rs = sorted(rs, key=lambda r: r[1])
        targets = [r for r in rs if r[2] == target]
        if last_only and targets:
            targets = [targets[-1]]
        for t in targets:
            ctx = [r for r in rs if r[1] < t[1]]
            if budget is not None:
                kept, s = [], 0
                for r in reversed(ctx):
                    n = _ntok(r[3])
                    if s + n > budget:
                        break
                    kept.append(r)
                    s += n
                ctx = list(reversed(kept))
            if len(ctx) < min_ctx:
                continue
            prompt = sep.join(
                f"{r[2] if r[2] is not None else ''}: {r[3] if r[3] is not None else ''}"
                for r in ctx
            )
            out.append((conv, t[1], prompt, t[3] if t[3] is not None else "",
                        sum(_ntok(r[3]) for r in ctx), _ntok(t[3]), len(ctx)))
    return sorted(out)


def _got(df):
    return sorted(tuple(r) for r in df.collect())


ROWS = [
    ("c1", 0, "user", "hello there friend"),
    ("c1", 1, "assistant", "hi how can I help"),
    ("c1", 2, "user", "explain spark windows please"),
    ("c1", 3, "tool", "search(spark windows)"),
    ("c1", 4, "assistant", "windows partition then order"),
    ("c2", 0, "assistant", "opening message no context"),
    ("c2", 1, "user", None),                     # null text → 0 tokens
    ("c2", 2, "assistant", "replying to a null turn"),
    ("c3", 0, "user", "   "),                    # whitespace-only → 0 tokens
    ("c3", 1, "assistant", "short"),
]


def test_matches_reference_no_budget(spark):
    df = spark.createDataFrame(ROWS, TURNS_SCHEMA)
    assert _got(sft_examples(df)) == _ref(ROWS)


def test_matches_reference_with_budget(spark):
    df = spark.createDataFrame(ROWS, TURNS_SCHEMA)
    for budget in (0, 3, 4, 7, 8, 100):
        got = _got(sft_examples(df, budget_tokens=budget, min_context_turns=0))
        want = _ref(ROWS, budget=budget, min_ctx=0)
        assert got == want, f"budget={budget}"
        # hard budget invariant
        assert all(r[4] <= budget for r in got)


def test_last_only_and_min_context(spark):
    df = spark.createDataFrame(ROWS, TURNS_SCHEMA)
    got = _got(sft_examples(df, last_only=True))
    assert got == _ref(ROWS, last_only=True)
    assert [r[0] for r in got] == ["c1", "c2", "c3"]  # one per conv
    # min_context_turns=1 drops the context-free opening assistant turn
    assert ("c2", 0) not in {(r[0], r[1]) for r in _got(sft_examples(df))}


def test_randomized_transcripts_match_reference(spark):
    rng = random.Random(42)
    words = ["alpha", "beta", "gamma", "delta", "eps"]
    rows = []
    for c in range(25):
        for t in range(rng.randint(1, 12)):
            role = rng.choice(["user", "assistant", "tool"])
            text = (
                None
                if rng.random() < 0.08
                else " ".join(rng.choices(words, k=rng.randint(0, 6)))
            )
            rows.append((f"conv{c}", t, role, text))
    df = spark.createDataFrame(rows, TURNS_SCHEMA)
    for budget, last in [(None, False), (5, False), (9, True), (0, False)]:
        got = _got(sft_examples(df, budget_tokens=budget, last_only=last,
                                min_context_turns=0))
        assert got == _ref(rows, budget=budget, last_only=last, min_ctx=0), (
            budget, last)


def test_plan_is_single_window_pass_no_join(spark):
    df = spark.createDataFrame(ROWS, TURNS_SCHEMA)
    plan = sft_examples(df, budget_tokens=8)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Join" not in plan  # no prefix self-join
    assert "CartesianProduct" not in plan
