"""Token-budget sequence packing and deterministic resharding — the
two order-defining steps of a training-data pipeline.

``pack_sequences`` is the GPT-style pack: concatenate documents in a
deterministic order (one EOD token between docs) and cut the token
stream into fixed ``ctx``-length blocks. Each document therefore gets
the block id where it starts, its token offset inside that block, and
how many blocks it spans. Publicly described in the GPT-2/3 and
Megatron data pipelines; no reference analogue (LLM-pipeline
extension, SURVEY §2.7).

Scale shape: a single global token cumsum would serialize on one
ordering, so packing is **two-level** — documents hash into ``shards``
independent streams (the unit a real pipeline writes as one output
file), and the cumulative sum runs per shard: ``shards`` independent
window partitions, each sorted locally after ONE hash shuffle. Block
ids are globally unique via ``shard * 2^32 + local_block``.

``reshard`` is the deterministic global shuffle used to fix a training
order: shard = salted-hash bucket of the key, position = rank of the
hash inside the shard. Re-runs and other engines reproduce the exact
order (md5-based, partitioning-independent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hnormalise_spark.ops.sampling import key_hash_unit
from hnormalise_spark.ops.textops import token_count

_BLOCK_SPAN = 1 << 32


def pack_sequences(
    df: DataFrame,
    ctx: int,
    text_col: str = "text",
    key_col: str = "doc_id",
    shards: int = 8,
) -> DataFrame:
    """Assign every document its pack location under concat-then-chunk
    packing with context length ``ctx``.

    Adds: ``shard``, ``n_tok`` (tokens incl. one EOD), ``block_id``
    (globally unique id of the block where the doc starts),
    ``block_off`` (token offset inside that block), ``n_blocks``
    (blocks the doc touches). Order inside a shard is ascending
    ``key_col`` — deterministic and engine-portable."""
    shard = F.floor(key_hash_unit(F.col(key_col), "pack") * shards).cast("int")
    n_tok = (token_count(F.col(text_col)) + F.lit(1)).cast("long")  # +1 EOD
    w = (
        Window.partitionBy("shard")
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = df.withColumns({"shard": shard, "n_tok": n_tok}).withColumn(
        "cum_before", F.coalesce(F.sum("n_tok").over(w), F.lit(0))
    )
    first_blk = F.floor(F.col("cum_before") / ctx)
    last_blk = F.floor((F.col("cum_before") + F.col("n_tok") - 1) / ctx)
    return (
        out.withColumn(
            "block_id", (F.col("shard").cast("long") * _BLOCK_SPAN + first_blk)
        )
        .withColumn("block_off", (F.col("cum_before") % ctx).cast("long"))
        .withColumn("n_blocks", (last_blk - first_blk + 1).cast("long"))
        .drop("cum_before")
    )


def length_bucket_batches(
    df: DataFrame,
    bucket_width: int = 64,
    batch_size: int = 32,
    shards: int = 8,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    max_tokens: int | None = None,
) -> DataFrame:
    """Length-bucketed batch assembly with a per-row padding-waste
    report — the PADDED-batch counterpart of pack_sequences (packing
    concatenates; inference, finetuning and any pipeline that must
    keep sequences intact instead pads, and pays max(batch) - len per
    row). Sequences land in length buckets of ``bucket_width`` tokens,
    are ranked inside (bucket, shard) by id, and every ``batch_size``
    consecutive ranks form one batch. All input columns pass through
    (the batch needs its token content downstream — dropping it would
    force the caller into a corpus-sized re-join); adds per sequence:
    ``n_tok``, ``bucket``, ``shard``, ``batch_idx`` (rank //
    batch_size inside the bucket-shard), ``batch_max_len`` (the
    batch's padded length) and ``pad_ppm`` (this row's padding
    fraction of the padded slot, integer ppm). Zero-length sequences
    are excluded (nothing to batch).

    Scale shape: ONE shuffle keyed (bucket, shard). A bucket holds
    every similar-length sequence in the corpus — at 10^12 rows that
    is billions per bucket, so ranking directly per bucket would
    serialize each bucket onto one task; the salted hash shard (the
    pack_sequences two-level trick) bounds every window partition at
    1/shards of a bucket while keeping batches deterministic and
    length-homogeneous. batch_max_len is a second window over the
    SAME partitioning (no extra Exchange). Order inside a shard is
    ascending id — engine-portable, re-run-stable.

    ``max_tokens`` switches to fairseq-style TOKEN-BUDGET batching:
    ``batch_size`` is ignored and each bucket's batch capacity is
    ``max(1, max_tokens // bucket_ceiling)`` (ceiling =
    (bucket+1)·bucket_width) — short sequences form large batches,
    long ones small, and every batch's padded cost
    ``batch_n · batch_max_len ≤ max_tokens`` by construction (except
    single-sequence batches of over-budget sequences, which a budget
    batcher must still emit). This is the distributable form of the
    sequential max-tokens greedy: capacity is a pure function of the
    bucket, so no batch depends on any other batch's contents.
    ``batch_n`` and ``batch_cost`` are reported per row in both
    modes (same window, no extra Exchange).
    """
    n_tok = F.size(F.filter(F.col(tokens_col), lambda t: t.isNotNull())).cast("long")
    shard = F.floor(key_hash_unit(F.col(id_col), "lbb") * shards).cast("int")
    base = (
        df.withColumn("n_tok", n_tok)
        .filter(F.col("n_tok") > 0)
        .withColumn("bucket", F.floor((F.col("n_tok") - 1) / bucket_width).cast("int"))
        .withColumn("shard", shard)
    )
    if max_tokens is None:
        cap = F.lit(int(batch_size)).cast("long")
    else:
        cap = F.greatest(
            F.lit(1),
            F.floor(
                F.lit(int(max_tokens))
                / ((F.col("bucket") + 1) * F.lit(int(bucket_width)))
            ),
        ).cast("long")
    rank_w = Window.partitionBy("bucket", "shard").orderBy(F.col(id_col).asc())
    ranked = base.withColumn(
        "batch_idx",
        F.floor((F.row_number().over(rank_w) - 1) / cap).cast("long"),
    )
    batch_w = Window.partitionBy("bucket", "shard", "batch_idx")
    return (
        ranked.withColumn("batch_max_len", F.max("n_tok").over(batch_w))
        .withColumn("batch_n", F.count(F.lit(1)).over(batch_w).cast("long"))
        .withColumn(
            "batch_cost", (F.col("batch_n") * F.col("batch_max_len")).cast("long")
        )
        .withColumn(
            "pad_ppm",
            F.floor(
                (F.col("batch_max_len") - F.col("n_tok"))
                * F.lit(1_000_000)
                / F.col("batch_max_len")
                + F.lit(0.5)
            ).cast("long"),
        )
    )


def mix_sources(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    key_col: str = "doc_id",
    shards: int = 8,
    salt: str = "mix",
) -> DataFrame:
    """Deterministic weighted interleave of sources into a training
    order — the "data mixing weights" step (publicly described for
    GPT-3 / The Pile / LLaMA corpora): a source with weight w appears
    w times as often per unit of output as a weight-1 source.

    Stride scheduling: within a shard, the i-th doc of source s (1-
    based rank of its salted hash) gets virtual time ``i / w_s``;
    the output order is ascending virtual time (ties: source, key).
    Sources absent from ``weights`` are dropped. No document is
    repeated — weights set interleave frequency, not duplication.

    Scale shape: two hash shuffles and nothing global — ranks need
    (shard, source) partitions, positions need (shard); each of the
    ``shards`` output streams interleaves independently (the unit a
    real pipeline writes as one file). Deterministic: every rank and
    position is a pure function of md5(key), so any engine, run, or
    partitioning reproduces the same order."""
    wexpr = None
    for sname, wt in weights.items():
        cond = F.col(source_col) == F.lit(sname)
        wexpr = F.when(cond, float(wt)) if wexpr is None else wexpr.when(cond, float(wt))
    u = key_hash_unit(F.col(key_col), salt)
    wr = Window.partitionBy("shard", source_col).orderBy("u", key_col)
    wp = Window.partitionBy("shard").orderBy("vt", source_col, key_col)
    return (
        # w > 0 also defines weight-0 as "exclude the source" (a plain
        # isNotNull would crash the vt division with ANSI DIVIDE_BY_ZERO)
        df.withColumn("w", wexpr)
        .filter(F.col("w").isNotNull() & (F.col("w") > 0))
        .withColumn("u", u)
        .withColumn("shard", F.floor(F.col("u") * shards).cast("int"))
        .withColumn("vt", F.row_number().over(wr).cast("double") / F.col("w"))
        .withColumn("pos", (F.row_number().over(wp) - 1).cast("long"))
        .drop("u", "w")
    )


def reshard(
    df: DataFrame, shards: int, key_col: str = "doc_id", salt: str = "shard"
) -> DataFrame:
    """Deterministic shuffle-and-split: ``shard`` = hash bucket,
    ``pos`` = 0-based rank of the salted hash within the shard (ties
    broken by the key, so the order is total). One hash-partition
    shuffle + per-shard local sort — exactly the physical work any
    resharding must do; nothing global."""
    u = key_hash_unit(F.col(key_col), salt)
    w = Window.partitionBy("shard").orderBy("u", key_col)
    return (
        df.withColumn("u", u)
        .withColumn("shard", F.floor(F.col("u") * shards).cast("int"))
        .withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .drop("u")
    )
