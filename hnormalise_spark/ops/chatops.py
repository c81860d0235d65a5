"""Chat/SFT data-prep operators.

Supervised fine-tuning corpora are turn-structured: alternating
user/assistant messages where ONLY assistant tokens contribute to the
loss, and the whole conversation must fit a fixed context window with
truncation at TURN boundaries (cutting mid-turn leaks a half answer
into the loss mask). These operators build the turn structure and the
loss-mask / truncation accounting as pure JVM expressions — no UDF,
no shuffle: every column derives row-locally from the token array.

The reference (hpcugent/hnormalise) has no chat concept; this family
belongs to the north-rule's training-data-pipeline extension (SURVEY
§2.7), alongside packing / chunking / budget batching.

Determinism: turn boundaries are fixed-width over the whitespace
token sequence, so the same document always yields the same
conversation — engine-portable (the DuckDB oracle recomputes every
count in closed form from n_tok alone, while this side derives them
from the materialized turn structs; agreement IS the test that the
structure was built right).

Scale shape: zero-shuffle projections. At 10^12 sequences the op is
embarrassingly parallel over whatever partitioning the scan gives;
nothing here changes partitioning or collects.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _tokens(text: Column) -> Column:
    """Whitespace tokens (blank-safe) — the shared repo-wide
    definition, so chat-turn counts can never drift from the
    classifier/quality token counts."""
    from hnormalise_spark.ops.textops import whitespace_tokens

    return whitespace_tokens(text)


def chat_turns(
    text: Column, turn_tokens: int = 8, first_role: str = "user"
) -> Column:
    """Build the conversation: array<struct<turn_idx, role, toks>>.

    Fixed-width turns of ``turn_tokens`` whitespace tokens, roles
    alternating from ``first_role``. The LAST turn may be short (the
    remainder), mirroring real SFT data where the closing assistant
    message is rarely budget-aligned.
    """
    other = "assistant" if first_role == "user" else "user"
    toks = _tokens(text)
    n_turns = F.ceil(F.size(toks) / F.lit(turn_tokens)).cast("int")
    # sequence(0, -1) yields a DESCENDING [0, -1] (step inferred), so
    # the zero-turn case needs an explicit empty index array
    idx = F.when(n_turns > 0, F.sequence(F.lit(0), n_turns - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx,
        lambda i: F.struct(
            i.cast("int").alias("turn_idx"),
            F.when(i % 2 == 0, F.lit(first_role))
            .otherwise(F.lit(other))
            .alias("role"),
            F.slice(toks, i * turn_tokens + 1, turn_tokens).alias("toks"),
        ),
    )


def sft_mask_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    turn_tokens: int = 8,
    max_ctx: int = 50,
) -> DataFrame:
    """Per-conversation SFT loss-mask + context-truncation accounting.

    Builds the real turn structure with :func:`chat_turns`, then
    derives — FROM THE STRUCTURE, not from closed-form arithmetic —
    the numbers a trainer's data loader needs:

    - ``n_tok`` / ``n_turns`` — conversation size,
    - ``n_user_tok`` / ``n_asst_tok`` — role split; assistant tokens
      are the loss tokens,
    - ``loss_ppm`` — assistant share of all tokens (integer ppm);
      the "what fraction of compute trains on answers" dial,
    - ``kept_turns`` / ``kept_tokens`` — greedy whole-turn packing
      into a ``max_ctx``-token window (a turn enters iff it fits the
      REMAINING budget; once one turn is dropped, later turns are
      dropped too — suffix truncation, never a gap),
    - ``trunc_tokens`` — tokens lost to the context window.

    The greedy fold is a single ``aggregate`` over the turn array
    with (kept_turns, kept_tokens, open) state; ``open`` latches
    false at the first non-fitting turn so a short final turn cannot
    sneak back in after a full middle turn was dropped.

    Default ``max_ctx=50`` with ``turn_tokens=8`` makes the window
    NOT turn-aligned (6 full turns = 48, remainder 2), so the
    partial-last-turn branch is exercised on real data.
    """
    text = F.col(text_col)
    turns = chat_turns(text, turn_tokens)
    toks_of = lambda t: F.size(t["toks"])  # noqa: E731

    fold = F.aggregate(
        turns,
        F.struct(
            F.lit(0).alias("kept_turns"),
            F.lit(0).alias("kept_tokens"),
            F.lit(True).alias("open"),
        ),
        lambda acc, t: F.when(
            acc["open"] & (acc["kept_tokens"] + toks_of(t) <= max_ctx),
            F.struct(
                (acc["kept_turns"] + 1).alias("kept_turns"),
                (acc["kept_tokens"] + toks_of(t)).alias("kept_tokens"),
                F.lit(True).alias("open"),
            ),
        ).otherwise(
            F.struct(
                acc["kept_turns"].alias("kept_turns"),
                acc["kept_tokens"].alias("kept_tokens"),
                F.lit(False).alias("open"),
            )
        ),
    )

    role_tok = lambda role: F.aggregate(  # noqa: E731
        F.filter(turns, lambda t: t["role"] == role),
        F.lit(0),
        lambda acc, t: acc + toks_of(t),
    )

    base = df.filter(text.isNotNull()).select(
        F.col(id_col).cast("long").alias(id_col),
        F.size(_tokens(text)).cast("long").alias("n_tok"),
        F.size(turns).cast("long").alias("n_turns"),
        role_tok("user").cast("long").alias("n_user_tok"),
        role_tok("assistant").cast("long").alias("n_asst_tok"),
        fold.alias("_f"),
    )
    return base.select(
        id_col,
        "n_tok",
        "n_turns",
        "n_user_tok",
        "n_asst_tok",
        F.when(F.col("n_tok") > 0,
               F.floor(F.col("n_asst_tok") / F.col("n_tok") * F.lit(1e6)
                       + F.lit(0.5)))
        .otherwise(F.lit(0)).cast("long").alias("loss_ppm"),
        F.col("_f.kept_turns").cast("long").alias("kept_turns"),
        F.col("_f.kept_tokens").cast("long").alias("kept_tokens"),
        (F.col("n_tok") - F.col("_f.kept_tokens")).cast("long")
        .alias("trunc_tokens"),
    )


def curriculum_schedule(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_stages: int = 4,
) -> DataFrame:
    """Quality-staged curriculum order: which stage each document
    trains in, its deterministic position within the stage, and the
    cumulative token count up to and including it.

    Stages partition the corpus by GLOBAL quality percentile
    (cume_dist over the integer quality score, ties share a stage):
    stage 0 = lowest-quality quartile … stage n-1 = highest — an
    easy-to-hard curriculum flips the stage order at read time, the
    schedule itself is direction-agnostic. Within a stage the order
    is md5(id): a fixed, unbiased shuffle every engine reproduces
    (RAND() would not survive a re-run; insertion order would not
    survive a repartition).

    Scale shape: one global cume_dist window (the honest cost of
    exact global percentiles — at 10^12 rows swap in the mergeable
    ``sketch_quantiles`` histogram for the stage thresholds) plus
    one per-stage ordered window for rank + running tokens. A
    curriculum IS a total order, so a per-stage sort is inherent; at
    cluster scale emit (stage, shard, rank-in-shard) with strided
    readers instead of one sequence — same columns, sharded window.
    """
    from hnormalise_spark.ops.textops import quality_score, token_count

    text = F.col(text_col)
    q = F.floor(quality_score(text) * F.lit(10000.0) + F.lit(0.5)).cast("long")
    base = df.filter(text.isNotNull()).select(
        F.col(id_col).cast("long").alias(id_col),
        q.alias("quality_x1e4"),
        token_count(text).cast("long").alias("n_tok"),
        F.md5(F.col(id_col).cast("string")).alias("_h"),
    )
    wq = Window.orderBy("quality_x1e4")
    staged = base.select(
        id_col,
        "quality_x1e4",
        "n_tok",
        "_h",
        # both clamps: least() caps cume_dist=1.0 at the top stage,
        # greatest() guards the bottom — at >~4e9 rows the smallest
        # cume_dist*n_stages drops below the 1e-9 tie-epsilon and
        # floor would emit stage -1
        F.greatest(
            F.lit(0),
            F.least(
                F.lit(n_stages - 1),
                F.floor(F.cume_dist().over(wq) * F.lit(float(n_stages))
                        - F.lit(1e-9)).cast("int"),
            ),
        ).cast("long").alias("stage"),
    )
    ws = Window.partitionBy("stage").orderBy("_h", id_col)
    return staged.select(
        id_col,
        "stage",
        "quality_x1e4",
        "n_tok",
        F.row_number().over(ws).cast("long").alias("rank_in_stage"),
        F.sum("n_tok").over(
            ws.rowsBetween(Window.unboundedPreceding, 0)
        ).cast("long").alias("cum_tokens"),
    )


def render_chat(
    text: Column, turn_tokens: int = 8, first_role: str = "user"
) -> Column:
    """Flatten the turn structure into training text with role tags:
    ``<|user|> tok tok ...<|assistant|> tok ...`` — the template step
    between turn-structured data and the tokenizer. Byte-exact and
    engine-portable (pure concat over the turn array), so the oracle
    can pin the rendered string itself, not just its statistics.
    Empty conversations render as ''.
    """
    turns = chat_turns(text, turn_tokens, first_role)
    return F.array_join(
        F.transform(
            turns,
            lambda t: F.concat(
                F.lit("<|"), t["role"], F.lit("|> "),
                F.array_join(t["toks"], " "),
            ),
        ),
        "",
    )


def rendered_conversations(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    turn_tokens: int = 8,
) -> DataFrame:
    """Per-doc rendered SFT text plus its length — zero-shuffle
    projection; the length rides along so downstream batching can
    budget without re-measuring."""
    rendered = render_chat(F.col(text_col), turn_tokens)
    return df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).cast("long").alias(id_col),
        rendered.alias("rendered"),
        F.length(rendered).cast("long").alias("n_rendered_chars"),
    )
