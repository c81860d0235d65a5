#!/usr/bin/env python
"""10× scale re-stamp (round-4 verdict item 8): run the flagship +
exact_dedup + minhash_lsh legs at "sf1" — a deterministic 10× blow-up
of the sf0.1 documents table — and record lines/s plus plan stability
(same physical join/agg strategy, no new scale cliffs) for BASELINE.md.

sf1 construction (no external data, fully deterministic): each sf0.1
row is replicated 10× with doc_id remapped to doc_id + replica*10^7
and replica r's text passed through an ALPHABET ROTATION by r
(``translate(text, a..z, rot_r(a..z))``). An injective character
substitution preserves text length, word shape, and within-replica
Jaccard EXACTLY — so each replica keeps sf0.1's dup/near-dup
structure and identical per-row shingle/fingerprint work — while
rewriting essentially every character shingle, so replicas of the
same doc do NOT near-dup each other. (The first draft appended a
tiny " rep<r>" suffix instead; that left the 10 replicas of every
doc mutual near-duplicates, inflating true pairs 404× for 10× rows
— a property of that corpus, not an operator cliff; the measurement
is kept in BASELINE.md as the output-scaling datapoint.)
Written once to /tmp/hnorm_sf1 (testdata is read-only).

Usage: python scripts/sf1_stamp.py
Prints one JSON line per (leg, sf) + a summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import STEAL_MAX, _cpu_sample, _steal_pct, force  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/hnorm_sf1"
LEGS = [
    "exact_dedup", "minhash_lsh", "training_pipeline",
    # round-5 documents-table additions
    "quality_classifier", "token_dedup", "token_neardup",
    "dsir_select", "dsir_curation",
    # late round-5 documents-table additions (tokenops suite +
    # sampling/drift; log_templates family reads orders.parquet,
    # which the sf1 blow-up doesn't replicate, so it stays out)
    "token_chunks", "token_decontam", "token_oov", "token_pack",
    "token_zipf", "token_repetition", "stratified_take",
    "source_token_kl", "vocab_remap", "length_buckets",
    "batch_pipeline", "token_clusters", "token_lm",
    # final round-5 additions: documents-table n-gram/curation ops and
    # the embedding-side retrieval/dedup legs (embeddings.parquet is
    # also replicated 10x below; the replicas are direction-perturbed
    # so they form realistic near-dup clusters rather than exact
    # copies — the hot-bucket stress case the guards exist for)
    "source_overlap", "ngram_novelty", "domain_reweight", "length_trim",
    "semdedup", "hard_negatives", "rrf_fusion", "cluster_canonical",
    "data_card", "card_diff",
    # post-final additions: PMI phrase mining + blocklist filtering,
    # both pure documents-table ops
    "pmi_phrases", "blocklist", "snapshot_diff", "heaps_growth",
    "lang_confusion", "span_plan", "distinct_ngrams", "budget_batches",
    "release_pipeline", "domain_matrix", "edit_neardup", "quality_pct",
    "exemplars",
    # continued-session additions: SFT/chat prep + curriculum
    # (documents-table), prefix-containment dedup, and the
    # fixed-size-bed LSH eval (its stamp SHOULD be ~flat — the
    # bounded-cost property is the thing being stamped)
    "sft_masking", "curriculum", "prefix_dedup", "dedup_eval",
    "chat_render", "knn_classify", "classifier_roc",
]
REPLICAS = 10


def build_sf1(spark) -> None:
    from pyspark.sql import functions as F

    out = os.path.join(SF1, "documents.parquet")
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return
    docs = spark.read.parquet(os.path.join(SF01, "documents.parquet"))
    reps = spark.range(REPLICAS).toDF("_r")
    alpha = "abcdefghijklmnopqrstuvwxyz"
    rotated = F.when(F.col("_r") == 0, F.col("text"))
    for r in range(1, REPLICAS):
        rot = alpha[r:] + alpha[:r]
        rotated = rotated.when(
            F.col("_r") == r, F.translate(F.col("text"), alpha, rot)
        )
    big = (
        docs.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") + F.col("_r") * 10_000_000).alias("doc_id"),
            rotated.alias("text"),
            "lang",
            "source",
            F.length("text").alias("n_chars"),
        )
        .repartition(64, "doc_id")
    )
    big.write.mode("overwrite").parquet(out)

    # Embeddings 10x: same id shift as documents (the synthetic corpus
    # keeps doc_id == vec_id, so quality joins still land), with a
    # deterministic per-(replica, dim) direction perturbation so the
    # replicas are NEAR-duplicates of the originals — a planted dense
    # semantic cluster per vector, the exact skew shape the
    # embedding_neardup hot-bucket guard exists for.
    eout = os.path.join(SF1, "embeddings.parquet")
    if not os.path.exists(os.path.join(eout, "_SUCCESS")):
        emb = spark.read.parquet(os.path.join(SF01, "embeddings.parquet"))
        bige = (
            emb.crossJoin(F.broadcast(reps))
            .select(
                (F.col("vec_id") + F.col("_r") * 10_000_000).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x, i: (
                        x
                        + (F.col("_r").cast("float"))
                        * ((i % 7).cast("float") - F.lit(3.0))
                        * F.lit(0.002)
                    ).cast("float"),
                ).alias("embedding"),
                "label",
            )
            .repartition(32, "vec_id")
        )
        bige.write.mode("overwrite").parquet(eout)


def plan_shape(df) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "exch": plan.count("Exchange"),
        "cartesian": plan.count("CartesianProduct"),
    }


def main() -> int:
    from hnormalise_spark import get_spark

    import __spark_entry__ as entry

    spark = get_spark(master="local[32]", app_name="sf1-stamp")
    spark.range(10).count()
    build_sf1(spark)
    n01 = spark.read.parquet(os.path.join(SF01, "documents.parquet")).count()
    n1 = spark.read.parquet(os.path.join(SF1, "documents.parquet")).count()
    print(json.dumps({"sf0.1_rows": n01, "sf1_rows": n1}), flush=True)

    qs = entry.queries()
    results = {}
    only = set(sys.argv[1].split(",")) if len(sys.argv) > 1 else None
    for leg in LEGS:
        if only and leg not in only:
            continue
        row = {}
        for sf_name, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
            df = qs[leg](spark, sf_dir)
            force(df)  # warm: exclude plan-shape compile constant
            s0 = _cpu_sample()
            t0 = time.perf_counter()
            force(qs[leg](spark, sf_dir))
            wall = time.perf_counter() - t0
            steal = _steal_pct(s0, _cpu_sample())
            row[sf_name] = {
                "wall_sec": round(wall, 2),
                "steal_pct": steal,
                "plan": plan_shape(qs[leg](spark, sf_dir)),
            }
            print(json.dumps({"leg": leg, "sf": sf_name, **row[sf_name]}), flush=True)
        r = row["sf1"]["wall_sec"] / max(row["sf0.1"]["wall_sec"], 1e-9)
        results[leg] = {
            **row,
            "wall_ratio_10x": round(r, 2),
            "plan_stable": row["sf0.1"]["plan"] == row["sf1"]["plan"],
        }
    print("SUMMARY " + json.dumps({
        leg: {
            "wall_ratio_10x": v["wall_ratio_10x"],
            "plan_stable": v["plan_stable"],
        } for leg, v in results.items()
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
