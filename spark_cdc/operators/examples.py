"""Transcript → supervised-fine-tuning example assembly.

The corpus this engine maintains is multi-turn conversation
transcripts (one row per turn); the terminal data product of such a
pipeline is *training examples*: for a chosen target role, each target
turn becomes ``(prompt = rendered preceding turns, completion = the
target turn's text)``, optionally truncated to a token budget. The
reference stops at ingest + KPI views and has no analogue — this
closes the last mile from its `conversation_events` schema
(/root/reference/etl/clickhouse_schema/init.sql) to what a trainer
actually consumes, alongside chunking/packing
(:mod:`spark_cdc.operators.sampling`).

Shape, for 100 TB: everything is one window pass per conversation plus
JVM higher-order functions — no self-join of turns to prefixes (the
naive rendering, O(n²) shuffled rows per n-turn conversation), no
Python in the hot path, no driver loops.

- the prefix context is a single ordered ``collect_list`` window
  (grouped by conversation — never a global sort);
- each context struct carries the conversation's RUNNING token count
  (``ctok``), so "keep the longest whole-turn suffix within the
  budget" is a pure ``F.filter`` over the array: keep turn *j* iff
  ``ctok_j − ntok_j ≥ C − budget`` where ``C`` is the full prefix's
  token count — an O(prefix) vectorized predicate instead of a fold
  or a per-example re-tokenization.

Output size is inherently O(Σ prefix lengths) — that is the data
product, not an implementation artifact; ``last_only=True`` bounds it
to one example per conversation (the common SFT corpus shape).

Token counts use the whitespace convention of
:func:`spark_cdc.functions.text.token_count`, so budgets compose with
``chunk_documents`` / ``pack_chunks`` budgets downstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_cdc.functions.text import token_count


def sft_examples(
    turns: DataFrame,
    budget_tokens: int | None = None,
    target_role: str = "assistant",
    last_only: bool = False,
    min_context_turns: int = 1,
    sep: str = "\n",
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """Assemble SFT examples from a turns table.

    Returns ``(conv_col, turn_col, prompt, completion, prompt_tokens,
    completion_tokens, n_context_turns)`` — one row per target-role
    turn with at least ``min_context_turns`` surviving context turns.

    ``budget_tokens`` truncates the prompt **from the left at whole-
    turn granularity** (the newest context always survives; a single
    over-budget turn yields an empty context, filtered by
    ``min_context_turns``). ``last_only`` keeps only each
    conversation's final target-role turn.
    """
    if budget_tokens is not None and budget_tokens < 0:
        raise ValueError("budget_tokens must be >= 0")
    conv, turn, role, text = conv_col, turn_col, role_col, text_col

    base = turns.select(
        conv, turn, role, text, token_count(F.col(text)).alias("_ntok")
    )
    ordered = Window.partitionBy(conv).orderBy(turn)
    base = base.withColumn(
        "_ctok",
        F.sum("_ntok").over(
            ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    prefix = ordered.rowsBetween(Window.unboundedPreceding, -1)
    ctx = F.collect_list(F.struct(role, text, "_ntok", "_ctok")).over(prefix)
    df = base.withColumn("_ctx", ctx).where(F.col(role) == target_role)
    if last_only:
        per_conv = Window.partitionBy(conv)
        df = df.withColumn("_last", F.max(turn).over(per_conv)).where(
            F.col(turn) == F.col("_last")
        )

    # full-prefix token count C = running count at the newest context
    # turn (0 for an empty prefix)
    c_full = F.coalesce(F.element_at("_ctx", -1)["_ctok"], F.lit(0))
    if budget_tokens is not None:
        # longest whole-turn suffix with Σ ntok ≤ budget: suffix cost
        # from turn j is C − (ctok_j − ntok_j), so keep j iff
        # ctok_j − ntok_j ≥ C − budget
        floor = c_full - F.lit(budget_tokens)
        kept = F.filter(
            "_ctx", lambda t: t["_ctok"] - t["_ntok"] >= floor
        )
    else:
        kept = F.col("_ctx")
    df = df.withColumn("_kept", kept)

    render = F.array_join(
        F.transform(
            "_kept",
            lambda t: F.concat(
                F.coalesce(t[role], F.lit("")),
                F.lit(": "),
                F.coalesce(t[text], F.lit("")),
            ),
        ),
        sep,
    )
    kept_tokens = F.when(F.size("_kept") == 0, F.lit(0)).otherwise(
        c_full
        - (F.element_at("_kept", 1)["_ctok"] - F.element_at("_kept", 1)["_ntok"])
    )
    return (
        df.where(F.size("_kept") >= min_context_turns)
        .select(
            conv,
            turn,
            render.alias("prompt"),
            F.coalesce(F.col(text), F.lit("")).alias("completion"),
            kept_tokens.cast("int").alias("prompt_tokens"),
            F.col("_ntok").alias("completion_tokens"),
            F.size("_kept").alias("n_context_turns"),
        )
    )
