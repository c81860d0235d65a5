"""Prefix-containment dedup: planted truncations, guards, scope."""

from hnormalise_spark.ops.dedup import prefix_containment_pairs


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BASE = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"


def test_planted_truncation_found(spark):
    rows = [
        (1, BASE),
        (2, BASE[:40]),          # truncation of 1
        (3, "completely different text that is long enough to qualify"),
    ]
    out = {(r.id_a, r.id_b) for r in prefix_containment_pairs(_df(spark, rows)).collect()}
    assert out == {(2, 1)}


def test_direction_and_lengths(spark):
    rows = [(7, BASE[:45]), (4, BASE)]
    [r] = prefix_containment_pairs(_df(spark, rows)).collect()
    assert (r.id_a, r.id_b) == (7, 4)
    assert r.len_a == 45 and r.len_b == len(BASE)


def test_equal_texts_not_paired(spark):
    rows = [(1, BASE), (2, BASE)]
    assert prefix_containment_pairs(_df(spark, rows)).count() == 0


def test_case_and_whitespace_normalised(spark):
    rows = [(1, BASE.upper() + "  extra   tail words here"), (2, BASE)]
    out = {(r.id_a, r.id_b) for r in prefix_containment_pairs(_df(spark, rows)).collect()}
    assert out == {(2, 1)}


def test_short_docs_out_of_scope(spark):
    rows = [(1, "tiny prefix here"), (2, "tiny prefix here plus a much longer continuation of words")]
    # doc 1 normalizes to < 32 chars -> excluded by the stated bound
    assert prefix_containment_pairs(_df(spark, rows)).count() == 0


def test_hot_block_guard(spark):
    # 70 docs sharing a 32-char boilerplate prefix: block over
    # max_block=64 is dropped entirely, no quadratic pair blowup
    boiler = "shared boilerplate header words here padding"
    rows = [(i, f"{boiler} unique tail {i} " + "x " * i) for i in range(70)]
    out = prefix_containment_pairs(_df(spark, rows), max_block=64)
    assert out.count() == 0
    small = [(i, f"{boiler} unique tail {i}") for i in range(5)] + [
        (100, f"{boiler} unique tail 3 and more")
    ]
    got = {(r.id_a, r.id_b) for r in prefix_containment_pairs(_df(spark, small)).collect()}
    assert (3, 100) in got
