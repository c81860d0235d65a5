"""Operators over the canonical pre-tokenized table
``(doc_id, tokens: array<int>, n_tok, source)`` — the shape the
pipeline ingests at 10^12-sequence scale (schemas.py). Everything
here runs directly on the token arrays: no detokenisation, no string
materialisation of the sequence, so the 100-TB corpus is never
rewritten as text just to be deduplicated or scored.

Scale shapes:
* token_exact_dedup   — one shuffle on a 16-byte md5 fingerprint of
                        the sequence (never the array itself).
* token_minhash_dedup — per-row signature over token n-grams, then
                        the shared band-carry LSH verify
                        (dedup._band_carry_verify): no all-pairs.
* dsir_score          — hashed-feature importance weights (Xie et
                        al. 2023, "Data Selection for Language Models
                        via Importance Resampling"): two bounded
                        bucket-count shuffles (≤ n_buckets rows out),
                        a tiny weight join, and one per-doc aggregate
                        on a pre-explode doc partitioning.

Hashing discipline: md5-derived like the rest of the repo, so DuckDB
oracles replay bit-identical results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hnormalise_spark.ops.dedup import (
    _band_carry_verify,
    band_keys,
    minhash_signature,
)


def _tok_str(tokens: Column) -> Column:
    """Canonical string form of a token array: comma-joined decimal
    codes. Fixed-width-ish, unambiguous (no token renders a comma).
    Null elements are dropped first (the canonical schema forbids
    them — schemas.py declares array<int> containsNull=false — but a
    caller-supplied frame must not crash the Arrow twin or silently
    shift n-gram windows)."""
    return F.array_join(
        F.transform(
            F.filter(tokens, lambda t: t.isNotNull()),
            lambda t: t.cast("string"),
        ),
        ",",
    )


def token_fingerprint(tokens: Column) -> Column:
    """16-byte md5 fingerprint of the canonical sequence string —
    the dedup/shuffle key (the array itself never shuffles)."""
    return F.md5(_tok_str(tokens))


def token_exact_dedup(
    df: DataFrame, tokens_col: str = "tokens", id_col: str = "doc_id"
) -> DataFrame:
    """Exact sequence dedup: keeper = min id per fingerprint group.
    Adds ``fingerprint``, ``group_size``, ``is_dup`` — the token-table
    twin of dedup.exact_dedup (same contract, same single-shuffle
    plan keyed by the fixed-width fingerprint)."""
    w = Window.partitionBy("fingerprint")
    return (
        df.withColumn("fingerprint", token_fingerprint(F.col(tokens_col)))
        .withColumn("group_size", F.count(F.lit(1)).over(w))
        .withColumn("keeper_id", F.min(id_col).over(w))
        .withColumn("is_dup", F.col(id_col) != F.col("keeper_id"))
    )


def token_ngram_shingles(tokens: Column, n: int = 8) -> Column:
    """Distinct token n-grams as comma-joined strings; sequences
    shorter than n contribute their whole sequence as the single
    shingle (mirrors dedup.char_shingles' short-input rule). Null
    elements are dropped BEFORE windowing so the Arrow twin
    (_token_shingler) sees identical n-gram positions."""
    clean = F.filter(tokens, lambda t: t.isNotNull())
    ln = F.size(clean)
    return F.when(ln < n, F.array(_tok_str(clean))).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), ln - n + 1),
                lambda i: _tok_str(F.slice(clean, i, n)),
            )
        )
    )


def _token_shingler(n: int):
    """Arrow-batch twin of token_ngram_shingles: comma-joined token
    n-grams, first-occurrence-distinct, None for null/empty sequences
    (the SQL path's filter). Must stay bit-equal to the expression
    form — the DuckDB oracle replays that."""

    def sh(val):
        if val is None:
            return None
        # null elements arrive as None OR NaN depending on the Arrow
        # batch's null layout; t == t is the NaN test
        strs = [str(int(t)) for t in val if t is not None and t == t]
        if not strs:
            return None
        if len(strs) < n:
            return [",".join(strs)]
        return list(
            dict.fromkeys(
                ",".join(strs[i : i + n]) for i in range(len(strs) - n + 1)
            )
        )

    return sh


def token_minhash_dedup(
    df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    n: int = 8,
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.6,
    use_arrow: bool = True,
) -> DataFrame:
    """Near-duplicate sequences: token n-gram shingles → MinHash →
    LSH bands → in-bucket Jaccard verify ≥ threshold, reusing the
    text path's signature and band-carry verify machinery (including
    its Arrow-batched prep — the expression form's higher-order
    functions evaluate interpreted and measured ~4x slower at sf0.1).
    Returns (id_a, id_b, jaccard) with id_a < id_b.

    Null/empty sequences are dropped (they have no shingles)."""
    if use_arrow:
        from hnormalise_spark.ops.dedup import _minhash_prep_arrow

        base = _minhash_prep_arrow(
            df, id_col, tokens_col, n, k, bands, shingler=_token_shingler(n)
        )
    else:
        rows = k // bands
        base = (
            df.filter(
                F.col(tokens_col).isNotNull()
                & (F.size(F.filter(F.col(tokens_col), lambda t: t.isNotNull())) > 0)
            )
            .select(
                F.col(id_col).alias("_id"),
                token_ngram_shingles(F.col(tokens_col), n).alias("_sh"),
            )
            .withColumn("_sig", minhash_signature(F.col("_sh"), k))
            .withColumn("_bands", band_keys(F.col("_sig"), bands, rows))
            .drop("_sig")
        )
    return _band_carry_verify(base, threshold)


# ---------------------------------------------------------------------------
# DSIR hashed-feature importance scoring

DSIR_BUCKETS = 4096


def _feat_bucket(feat: Column, n_buckets: int, seed: str) -> Column:
    """Hashing-trick feature bucket: first 60 bits of md5 mod d."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(seed + "|"), feat)), 1, 15), 16, 10
        ).cast("long")
        % n_buckets
    )


def _doc_feature_buckets(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    n_buckets: int,
    seed: str,
    by_doc: bool = True,
) -> DataFrame:
    """(_doc, _b): one row per unigram + bigram occurrence, hashed to
    its weight bucket. With ``by_doc`` the explode happens on a doc-id
    partitioning established FIRST, so a downstream per-doc aggregate
    needs no further shuffle (the lm_unigram_score pattern); the
    count-only consumers skip that repartition — their bucket agg is
    map-side combined wherever the rows already live."""
    toks = F.col(tokens_col)
    unis = F.transform(toks, lambda t: t.cast("string"))
    bis = F.when(F.size(toks) >= 2, F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.concat_ws(
            " ",
            F.element_at(toks, i).cast("string"),
            F.element_at(toks, i + 1).cast("string"),
        ),
    )).otherwise(F.array().cast("array<string>"))
    base = df.filter(
        F.col(tokens_col).isNotNull() & (F.size(tokens_col) > 0)
    ).select(F.col(id_col).alias("_doc"), toks.alias(tokens_col))
    if by_doc:
        base = base.repartition(F.col("_doc"))
    return base.select(
        "_doc", F.explode(F.concat(unis, bis)).alias("_f")
    ).select("_doc", _feat_bucket(F.col("_f"), n_buckets, seed).alias("_b"))


def dsir_score(
    df: DataFrame,
    target: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    n_buckets: int = DSIR_BUCKETS,
    seed: str = "dsf",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023): score every sequence
    in ``df`` by the log-ratio of a target-distribution hashed n-gram
    bag-of-words model to the raw-distribution one,
    ``log p_target(x) - log p_raw(x)``, features = token unigrams +
    bigrams hashed into ``n_buckets`` slots, add-one smoothing over
    the slot count. Resampling by these weights is the published
    data-selection recipe; downstream, compose with
    sampling.weighted_sample_topk.

    Cross-engine determinism: each bucket's log-ratio is rounded to
    integer micro-nats BEFORE the per-doc sum (float sums are
    addition-order-dependent; integer sums are not).

    Scale shape: both distribution estimates are map-side-combined
    bucket counts (≤ n_buckets rows cross the wire); the weight table
    (≤ n_buckets rows) broadcast-joins onto the exploded corpus,
    whose doc partitioning is established before the explode, so the
    per-doc sum adds no shuffle. Nothing collects to the driver.

    Returns (id_col, n_feat, dsir_x1e6) for every non-empty sequence
    of ``df``; empty/null sequences have no features and are excluded.
    """
    raw_fb = _doc_feature_buckets(df, id_col, tokens_col, n_buckets, seed)

    raw_counts = (
        _doc_feature_buckets(df, id_col, tokens_col, n_buckets, seed, by_doc=False)
        .groupBy("_b").agg(F.count(F.lit(1)).alias("_cr"))
    )
    tgt_counts = (
        _doc_feature_buckets(target, id_col, tokens_col, n_buckets, seed, by_doc=False)
        .groupBy("_b").agg(F.count(F.lit(1)).alias("_ct"))
    )

    raw_tot = raw_counts.agg(F.sum("_cr").alias("_R"))
    tgt_tot = tgt_counts.agg(F.sum("_ct").alias("_T"))

    # Buckets absent from the raw side never occur in the scored
    # corpus, so the raw side anchors the join.
    d = F.lit(float(n_buckets))
    weights = (
        raw_counts.join(F.broadcast(tgt_counts), "_b", "left")
        .crossJoin(F.broadcast(raw_tot))
        .crossJoin(F.broadcast(tgt_tot))
        .select(
            "_b",
            F.floor(
                (
                    F.log((F.coalesce(F.col("_ct"), F.lit(0)) + 1.0) / (F.col("_T") + d))
                    - F.log((F.col("_cr") + 1.0) / (F.col("_R") + d))
                )
                * F.lit(1e6)
                + F.lit(0.5)
            ).cast("long").alias("_w"),
        )
    )

    return (
        raw_fb.join(F.broadcast(weights), "_b")
        .groupBy("_doc")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feat"),
            F.sum("_w").cast("long").alias("dsir_x1e6"),
        )
        .withColumnRenamed("_doc", id_col)
    )
