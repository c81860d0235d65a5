"""Deterministic hash-based sampling for training-data pipelines.

``df.sample()`` is engine- and partitioning-dependent (Bernoulli per
row with a per-partition seeded RNG), so two runs — or Spark vs any
other engine — keep different rows. Training pipelines need the
OPPOSITE: a sample that is a pure function of the row key, so that
re-runs, backfills, and downstream joins all see the same subset, and
so a holdout carved today stays disjoint from a training set carved
next month. The standard trick is key-hash thresholding: keep a row
iff ``hash(key) / 2^64 < rate``.

Scale shape: one projection + filter per row, no shuffle, pushed down
to the scan when the key is a stored column. The hash is md5-derived
(like every fingerprint in this repo) so a DuckDB oracle re-derives
the exact subset.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# the first 15 hex digits of md5 (60 bits) as a non-negative long —
# 15 digits keep conv() inside the positive long range
_HASH_SPAN = float(1 << 60)


def key_hash_unit(key: Column, salt: str = "") -> Column:
    """Uniform [0, 1) value derived from the key: first 60 bits of
    md5(key) scaled to the unit interval. Engine-portable (md5 is
    md5 everywhere) and independent of partitioning.

    ``salt`` derives an INDEPENDENT uniform from the same key
    (md5(key || '|' || salt)). Every distinct purpose that thresholds
    the key — sampling, splitting, shadow cohorts — must use its own
    salt: thresholding the SAME uniform twice correlates the
    decisions (e.g. rows kept at rate r all have u < r and can never
    land in a holdout interval above r)."""
    hashed = key.cast("string")
    if salt:
        hashed = F.concat(hashed, F.lit("|" + salt))
    return F.conv(F.substring(F.md5(hashed), 1, 15), 16, 10).cast(
        "double"
    ) / F.lit(_HASH_SPAN)


def hash_sample(df: DataFrame, rate: float, key_col: str) -> DataFrame:
    """Keep rows whose key hashes below ``rate`` — a deterministic,
    re-runnable ~rate sample. Disjoint splits come from disjoint
    intervals: train = [0, 0.9), holdout = [0.9, 1.0) — see
    ``hash_split``."""
    return df.filter(key_hash_unit(F.col(key_col)) < F.lit(float(rate)))


def hash_split(
    df: DataFrame,
    bounds: dict[str, tuple[float, float]],
    key_col: str,
    salt: str = "split",
) -> DataFrame:
    """Label every row with its split by hash interval, e.g.
    ``{"train": (0.0, 0.9), "holdout": (0.9, 1.0)}``. Intervals are
    half-open; rows outside every interval get NULL. One projection,
    no shuffle, stable across runs and engines.

    The split uniform is SALTED (default ``'split'``) so it is
    independent of any prior ``hash_sample``/``stratified_hash_sample``
    on the same key — otherwise rows that survived a keep-rate <= 0.9
    all have u < 0.9 and the holdout would only ever see rate-1.0
    strata. Pass ``salt=''`` explicitly for the one legitimate
    unsalted use: carving a holdout that is guaranteed disjoint from
    every smaller same-key ``hash_sample``."""
    u = key_hash_unit(F.col(key_col), salt)
    expr = None
    for name, (lo, hi) in bounds.items():
        cond = (u >= F.lit(float(lo))) & (u < F.lit(float(hi)))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("split", expr)


def stratified_hash_sample(
    df: DataFrame, rates: dict[str, float], stratum_col: str, key_col: str
) -> DataFrame:
    """Per-stratum deterministic sampling — e.g. keep 10% of crawl
    docs but 100% of curated docs. ``rates`` maps stratum value →
    keep rate; absent strata default to 0 (dropped). The rate lookup
    compiles to a literal CASE (a broadcast join for a very large
    strata map would work the same way); the filter stays a
    shuffle-free per-row predicate."""
    u = key_hash_unit(F.col(key_col))
    rate = None
    for value, r in rates.items():
        cond = F.col(stratum_col) == F.lit(value)
        rate = F.when(cond, float(r)) if rate is None else rate.when(cond, float(r))
    rate = rate.otherwise(F.lit(0.0)) if rate is not None else F.lit(0.0)
    return df.filter(u < rate)


def budget_select(
    df: DataFrame,
    budget_tokens: int,
    quality_col: str = "quality_x1e4",
    weight_col: str = "n_tok",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-budget data selection: keep the highest-quality documents
    whose cumulative token count fits within ``budget_tokens`` — the
    greedy prefix of the corpus ordered by (quality desc, doc_id asc).
    This is the standard "select the best N tokens" curation step that
    ends most pre-training data pipelines.

    Scale shape — a global ORDER BY + running sum is the textbook
    non-scalable formulation (one partition holds the whole corpus).
    This implementation is the two-pass threshold selection instead:

    1. Aggregate tokens per integer quality bucket (ONE map-side
       combined shuffle that collapses to at most |buckets| rows —
       quality is already integer-quantized, ≤ ~10⁴ distinct values)
       and collect the tiny histogram to the driver.
    2. Walk the histogram to find the threshold bucket t: every doc
       in a bucket ABOVE t fits in full (kept by a scan-level filter,
       no shuffle, predicate pushed down), and only the BOUNDARY
       bucket needs per-document resolution — a window over just the
       bucket-t rows (a vanishing fraction of the corpus) consumes
       the remaining budget in doc_id order.

    The result is EXACTLY the greedy-prefix selection (the DuckDB
    oracle recomputes it with the naive global window) at the cost of
    one tiny histogram shuffle + one boundary-bucket window.

    Ties inside a bucket break on ascending ``id_col``. Rows with a
    NULL quality or weight are never selected.

    Returns the selected rows: (doc_id, quality bucket, weight).
    """
    base = df.select(
        F.col(id_col),
        F.col(quality_col).cast("long").alias(quality_col),
        F.col(weight_col).cast("long").alias(weight_col),
    ).filter(F.col(quality_col).isNotNull() & F.col(weight_col).isNotNull())

    hist = (
        base.groupBy(quality_col)
        .agg(F.sum(weight_col).alias("_w"))
        .orderBy(F.desc(quality_col))
        .collect()
    )
    remaining = budget_tokens
    threshold = None  # bucket needing per-doc resolution
    full_above = None  # lowest bucket kept in full
    for row in hist:
        if row["_w"] <= remaining:
            remaining -= row["_w"]
            full_above = row[quality_col]
        else:
            threshold = row[quality_col]
            break

    parts = []
    if full_above is not None:
        parts.append(base.filter(F.col(quality_col) >= full_above))
    if threshold is not None and remaining > 0:
        from pyspark.sql import Window

        w = (
            Window.partitionBy(quality_col)
            .orderBy(F.asc(id_col))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        boundary = (
            base.filter(F.col(quality_col) == threshold)
            .withColumn("_cum", F.sum(weight_col).over(w))
            .filter(F.col("_cum") <= remaining)
            .drop("_cum")
        )
        parts.append(boundary)
    if not parts:
        return base.limit(0)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def budget_select_grouped(
    df: DataFrame,
    budgets: dict[str, int],
    group_col: str = "lang",
    quality_col: str = "quality_x1e4",
    weight_col: str = "n_tok",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group token-budget selection: an independent greedy
    best-quality prefix PER GROUP (the per-language token budgets
    every multilingual pre-training mix is specified in), same
    two-pass shape as ``budget_select`` — one (group, quality-bucket)
    histogram shuffle (still tiny: |groups| × |buckets| rows), the
    per-group thresholds resolved on the driver, full buckets kept by
    a pushed-down scan filter, and ONE window over only the boundary
    (group, bucket) pairs.

    Groups absent from ``budgets`` are dropped (budget 0). Returns the
    selected rows: (id, group, quality bucket, weight).
    """
    base = df.select(
        F.col(id_col),
        F.col(group_col),
        F.col(quality_col).cast("long").alias(quality_col),
        F.col(weight_col).cast("long").alias(weight_col),
    ).filter(
        F.col(quality_col).isNotNull()
        & F.col(weight_col).isNotNull()
        & F.col(group_col).isNotNull()
    )

    hist = (
        base.groupBy(group_col, quality_col)
        .agg(F.sum(weight_col).alias("_w"))
        .orderBy(F.asc(group_col), F.desc(quality_col))
        .collect()
    )
    remaining = dict(budgets)
    full_above: dict[str, int] = {}
    boundary: dict[str, tuple[int, int]] = {}  # group -> (bucket, leftover)
    done: set[str] = set()
    for row in hist:
        g = row[group_col]
        if g not in remaining or g in done:
            continue
        if row["_w"] <= remaining[g]:
            remaining[g] -= row["_w"]
            full_above[g] = row[quality_col]
        else:
            if remaining[g] > 0:
                boundary[g] = (row[quality_col], remaining[g])
            done.add(g)

    full_pred = None
    for g, b in full_above.items():
        p = (F.col(group_col) == g) & (F.col(quality_col) >= b)
        full_pred = p if full_pred is None else (full_pred | p)
    parts = []
    if full_pred is not None:
        parts.append(base.filter(full_pred))
    if boundary:
        from pyspark.sql import Window

        bpred = None
        leftover = None
        for g, (b, r) in boundary.items():
            p = (F.col(group_col) == g) & (F.col(quality_col) == b)
            bpred = p if bpred is None else (bpred | p)
            leftover = (
                F.when(F.col(group_col) == g, F.lit(r))
                if leftover is None
                else leftover.when(F.col(group_col) == g, F.lit(r))
            )
        w = (
            Window.partitionBy(group_col, quality_col)
            .orderBy(F.asc(id_col))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        parts.append(
            base.filter(bpred)
            .withColumn("_cum", F.sum(weight_col).over(w))
            .filter(F.col("_cum") <= leftover)
            .drop("_cum")
        )
    if not parts:
        return base.limit(0)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
