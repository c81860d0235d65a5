"""Plan hygiene across the ENTIRE query registry: every registered
query must build a physical plan with no CartesianProduct/BNLJ blowup
and no row-at-a-time Python UDF (BatchEvalPython) — Arrow-batched
Python (ArrowEvalPython) is the only sanctioned Python on the hot
path. This is the repo's scale contract as one regression net: a new
query that quietly introduces an all-pairs join or a per-row UDF
fails here, at sf0.001 plan-build cost."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"

# Queries whose CONSTRUCTION executes work (streams, iterative collect
# loops, index writes). Their internals are plan-asserted in their own
# suites; executing them here would re-run minutes of work for no new
# signal, so only their FINAL frame's plan is checked like the rest —
# none are exempt from the assertions, just noted for runtime.
_EAGER = {"stream_route_counts", "bpe_train", "bpe_encode",
          "dedup_incremental", "bm25_indexed", "similarity_ann_indexed",
          "sketch_distinct", "sketch_jaccard", "cm_heavy_hitters",
          "bloom_decontaminate", "token_decontam", "ops_triage"}


def _registry():
    import __spark_entry__ as e

    return e.queries()


@pytest.mark.parametrize("name", sorted(_registry()))
def test_no_cartesian_and_no_rowwise_python(spark, name):
    fn = _registry()[name]
    df = fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # CartesianProduct = unkeyed all-pairs; BroadcastNestedLoopJoin is
    # fine ONLY for the deliberate single-row broadcasts (crossJoin of
    # a 1-row aggregate), which Spark plans as BNLJ with a broadcast
    # side — so BNLJ is allowed, raw CartesianProduct is not.
    assert "CartesianProduct" not in plan, f"{name}: all-pairs join"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
