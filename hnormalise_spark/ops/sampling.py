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


def key_hash_long(key: Column, salt: str = "") -> Column:
    """The raw 60-bit md5 rank behind key_hash_unit, as a long — use
    when rows must be ORDERED by hash (quota ranking) rather than
    thresholded: comparing longs is exact, while the /2^60 double of
    key_hash_unit could in principle collapse adjacent ranks."""
    hashed = key.cast("string")
    if salt:
        hashed = F.concat(hashed, F.lit("|" + salt))
    return F.conv(F.substring(F.md5(hashed), 1, 15), 16, 10).cast("long")


def stratified_take(
    df: DataFrame,
    n_per_stratum: int,
    stratum_cols: list[str],
    key_col: str,
    salt: str = "take",
) -> DataFrame:
    """EXACT per-stratum quota: keep precisely ``min(n, |stratum|)``
    rows from every stratum, chosen by md5-hash rank — how balanced
    eval sets and per-(source, lang) capped mixtures are actually
    built. stratified_hash_sample keeps a RATE (so small strata can
    end up empty and quotas drift with |stratum|); this keeps a
    COUNT, deterministically: rank rows inside each stratum by
    (hash(key), key) ascending and take the first n. Adding rows to a
    stratum only ever displaces the highest-ranked kept rows — the
    sample is stable under appends, like every hash carve in this
    module.

    Scale shape: ONE hash-partitioned shuffle on the stratum columns;
    the rank is a window row_number inside each stratum, so per-task
    memory is one stratum's rows (strata are assumed numerous and
    individually bounded — for a handful of giant strata use
    stratified_hash_sample with rate ≈ n/|stratum| instead, which
    never shuffles). The (hash, key) tiebreak makes the result a pure
    function of the data; the salt decorrelates the ranking from any
    rate-based carve on the same key.
    """
    from pyspark.sql import Window

    rank_w = (
        Window.partitionBy(*[F.col(c) for c in stratum_cols])
        .orderBy(
            key_hash_long(F.col(key_col), salt=salt).asc(),
            F.col(key_col).cast("string").asc(),
        )
    )
    return (
        df.withColumn("_rk", F.row_number().over(rank_w))
        .filter(F.col("_rk") <= F.lit(int(n_per_stratum)))
        .drop("_rk")
    )


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


def weighted_sample_topk(
    df: DataFrame,
    n: int,
    weight_col: str,
    key_col: str,
    group_cols: list[str] | None = None,
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement via the
    Efraimidis-Spirakis A-ES scheme: each row gets priority
    ``u^(1/w)`` (equivalently rank key ``ln(u)/w``) with ``u`` the
    salted key-hash uniform; the n largest priorities are exactly a
    weight-proportional sample without replacement. Because u is a
    pure function of the key (no RNG state), the sample is
    re-runnable, engine-portable, and partition-invariant — the same
    properties hash_sample gives the unweighted case, which A-ES
    cannot get from ``df.sample``-style per-partition RNGs.

    Rows with weight <= 0 are excluded (they have probability 0).
    Ties on the rank key are broken by key to pin the boundary row.

    Scale shape: global top-n compiles to TakeOrderedAndProject
    (per-partition heaps, no shuffle of the data, driver holds only
    n rows); with ``group_cols`` it is one window rank per group —
    a single hash-partitioned sort, the standard per-group top-k.
    Use n << rows; for rate-shaped weighted THINNING at scale use a
    threshold on the same rank key instead of a global n.
    """
    u = key_hash_unit(F.col(key_col), salt)
    # ln(u)/w is monotone in u^(1/w); u in (0,1) so ln(u) < 0 and
    # larger weight pulls the key toward 0 (higher rank)
    rk = F.log(u) / F.col(weight_col).cast("double")
    base = df.filter(F.col(weight_col) > 0).withColumn("_es_rank", rk)
    if group_cols:
        from pyspark.sql import Window

        w = Window.partitionBy(*group_cols).orderBy(
            F.desc("_es_rank"), F.asc(key_col)
        )
        return (
            base.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= n)
            .drop("_rn", "_es_rank")
        )
    return (
        base.orderBy(F.desc("_es_rank"), F.asc(key_col))
        .limit(n)
        .drop("_es_rank")
    )


def temperature_mix_rates(
    counts: dict[str, int], alpha: float, budget_frac: float
) -> dict[str, float]:
    """Per-group keep rates for temperature-based mixing: target
    share of group g is ``count_g^alpha`` renormalized (alpha=1 →
    natural proportions, alpha=0 → equal share per group, 0<alpha<1
    → the multilingual-LM upsampling curve), scaled to a total
    budget of ``budget_frac * N`` rows. Rates cap at 1.0 (a group
    cannot yield more rows than it has; the shortfall is NOT
    redistributed — deliberate, so each group's rate depends only on
    the count vector and the formula stays one pass).

    Pure driver-side arithmetic on the tiny count map (one value per
    group — the same bounded-collect class as the budget-selection
    histogram); rates are truncated to a 1e-9 grid so an independent
    SQL engine computing the identical formula lands on the same
    comparison constants.
    """
    total = float(sum(counts.values()))
    weights = {g: float(c) ** alpha for g, c in counts.items()}
    wsum = sum(weights.values())
    budget = budget_frac * total
    out = {}
    for g, c in counts.items():
        rate = min(1.0, (weights[g] / wsum) * budget / float(c))
        out[g] = int(rate * 1e9) / 1e9
    return out


def temperature_mix(
    df: DataFrame,
    group_col: str,
    key_col: str,
    alpha: float,
    budget_frac: float,
    salt: str = "tmix",
) -> DataFrame:
    """Temperature-based source/language mixing: resample ``df`` so
    group shares follow ``count^alpha`` (renormalized) within a total
    budget of ``budget_frac * N`` rows — the standard recipe for
    upweighting low-resource languages / sources in LLM training
    mixes. Deterministic: group counts (one small aggregate, <=
    n_groups rows collected) fix the per-group keep rates, then a
    salted key-hash threshold picks the rows, so re-runs and
    backfills select the identical subset.

    Scale shape: pass 1 is a count-by-group (partial agg, tiny
    result); pass 2 is a shuffle-free per-row filter. Nothing scales
    with data size except the two scans."""
    counts = {
        r[0]: r[1]
        for r in df.groupBy(group_col).agg(F.count("*").alias("n")).collect()
    }
    rates = temperature_mix_rates(counts, alpha, budget_frac)
    u = key_hash_unit(F.col(key_col), salt)
    rate = None
    for g, r in rates.items():
        cond = F.col(group_col) == F.lit(g)
        rate = F.when(cond, r) if rate is None else rate.when(cond, r)
    rate = rate.otherwise(F.lit(0.0)) if rate is not None else F.lit(0.0)
    return df.filter(u < rate)


def epoch_plan(
    df: DataFrame,
    target_total: int,
    weights: dict,
    max_epochs: int = 4,
    source_col: str = "source",
    ntok_col: str = "n_tok",
) -> DataFrame:
    """Data-constrained repeat plan (Muennighoff et al. 2023,
    arXiv:2305.16264): given a token budget ``target_total`` and
    per-source mixing ``weights``, decide how many EPOCHS of each
    source to run when the desired token count exceeds what the
    source holds — repeating data beats substituting off-mix data up
    to ~4 epochs, hence the cap.

    Pure integer arithmetic end to end: desired_s =
    floor(target·w_s/ΣW); epochs_s = min(max_epochs,
    ceil(desired_s/avail_s)) (0 when the source gets no budget);
    planned_s = min(desired_s, epochs_s·avail_s); shortfall_s =
    desired_s − planned_s is the budget the cap leaves unfilled —
    the number a mixing loop redistributes or accepts.

    Scale shape: ONE map-side-combined (source → Σn_tok) aggregate
    over the corpus; everything after runs on |sources| rows with the
    weight table joined as a broadcast literal map. Sources absent
    from ``weights`` weigh 0 (explicit exclusion), so the op is total
    over whatever the scan finds.
    """
    items = []
    for k in sorted(weights):
        items += [F.lit(k), F.lit(int(weights[k]))]
    wmap = F.create_map(*items) if items else F.create_map()
    wsum = int(sum(int(v) for v in weights.values())) or 1

    avail = df.groupBy(F.col(source_col).alias("source")).agg(
        F.sum(F.col(ntok_col).cast("long")).alias("n_tok_avail")
    )
    desired = F.floor(
        F.lit(int(target_total))
        * F.coalesce(F.element_at(wmap, F.col("source")), F.lit(0)).cast("long")
        / F.lit(wsum)
    ).cast("long")
    planned = avail.withColumn("desired_tok", desired).withColumn(
        "epochs",
        F.when(F.col("desired_tok") <= 0, F.lit(0))
        .otherwise(
            F.least(
                F.lit(int(max_epochs)),
                # try_divide: a source whose rows all carry n_tok=0 has
                # nothing to repeat — 0 epochs, full shortfall — and
                # must not abort the batch under ANSI
                F.coalesce(
                    F.ceil(
                        F.try_divide(F.col("desired_tok"), F.col("n_tok_avail"))
                    ),
                    F.lit(0),
                ),
            )
        )
        .cast("long"),
    )
    return planned.select(
        "source",
        "n_tok_avail",
        "desired_tok",
        "epochs",
        F.least(F.col("desired_tok"), F.col("epochs") * F.col("n_tok_avail"))
        .cast("long")
        .alias("n_tok_planned"),
        (
            F.col("desired_tok")
            - F.least(F.col("desired_tok"), F.col("epochs") * F.col("n_tok_avail"))
        )
        .cast("long")
        .alias("shortfall"),
    )


def length_trim(
    df: DataFrame,
    lo_q_x1e6: int,
    hi_q_x1e6: int,
    width: int,
    nbins: int = 64,
    source_col: str = "source",
    len_col: str = "n_tok",
) -> DataFrame:
    """Per-source length-outlier trim driven by the mergeable
    histogram sketch: keep rows whose length lands inside the
    [lo-quantile bin, hi-quantile bin] band of THEIR source — the
    truncation/garbage tail cut every curation recipe applies before
    mixing, with per-source bounds so a long-form source isn't
    clipped by a short-form source's distribution.

    Two corpus scans, zero corpus shuffles: pass 1 builds the
    per-source histogram sketch (map-side-combined, ≤ |sources|·nbins
    rows cross the wire); the quantile bounds resolve on sketch-sized
    data and broadcast back for the pass-2 keep decision. Bounds are
    bin-granular and all-integer: keep iff lo_bin_edge ≤ len <
    hi_bin_edge + width (both winning bins inclusive), so the decision
    is engine-portable and partitioning cannot move it.

    Returns every input row plus (lo_est, hi_est, keep).
    """
    from hnormalise_spark.ops.sketches import hist_quantiles, hist_sketch

    sk = hist_sketch(df, [source_col], len_col, width=width, nbins=nbins)
    qs = hist_quantiles(sk, [source_col], width, [int(lo_q_x1e6), int(hi_q_x1e6)])
    bounds = (
        qs.groupBy(source_col)
        .pivot("q_x1e6", [int(lo_q_x1e6), int(hi_q_x1e6)])
        .min("est")
        .withColumnRenamed(str(int(lo_q_x1e6)), "lo_est")
        .withColumnRenamed(str(int(hi_q_x1e6)), "hi_est")
    )
    out = df.join(F.broadcast(bounds), source_col, "left")
    v = F.col(len_col).cast("long")
    return out.withColumn(
        "keep",
        (
            v.isNotNull()
            & (v >= F.col("lo_est"))
            & (v < F.col("hi_est") + F.lit(int(width)))
        ).cast("int"),
    )
