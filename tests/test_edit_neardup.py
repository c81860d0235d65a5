"""levenshtein_neardup: pure-Python replay, blocking recall limit,
hot-block guard, length band."""

import hashlib

import pytest

from hnormalise_spark.ops.dedup import levenshtein_neardup


def _lev(a, b):
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    return prev[n]


def _py(rows, max_dist=5, prefix_len=24, max_bucket=64):
    base = []
    for i, t in rows:
        if t is None:
            continue
        norm = " ".join(t.split()).strip().lower()
        bk = hashlib.md5(norm[:prefix_len].encode()).hexdigest()
        base.append((i, norm, bk))
    from collections import Counter

    bn = Counter(bk for _, _, bk in base)
    kept = [r for r in base if bn[r[2]] <= max_bucket]
    out = []
    for x, (ia, ta, ka) in enumerate(kept):
        for ib, tb, kb in kept[x + 1 :]:
            a, b = (ia, ta), (ib, tb)
            if ia > ib:
                a, b = b, a
            if ka == kb and abs(len(a[1]) - len(b[1])) <= max_dist:
                d = _lev(a[1], b[1])
                if d <= max_dist:
                    out.append((a[0], b[0], d))
    return sorted(out)


ROWS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog v2"),   # d=3
    (3, "the quick brown fox jumps over the hazy dog"),      # d=1 vs 1
    (4, "a totally different prefix entirely here"),
    (5, "the quick brown cat naps under the lazy dog"),      # same block, far
    (6, "THE  QUICK brown fox jumps over the lazy dog"),     # norm-equal to 1
    (7, None),
]


def test_matches_pure_python(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    got = sorted(
        (r.id_a, r.id_b, r.dist) for r in levenshtein_neardup(df).collect()
    )
    assert got == _py(ROWS)
    assert (1, 6, 0) in got   # normalization-equal pair at distance 0
    assert (1, 2, 3) in got   # suffix edit
    assert (1, 3, 1) in got   # single-char substitution
    assert all(i != 4 and j != 4 for i, j, _ in got)  # other block


def test_hot_block_guard(spark):
    # 70 rows sharing one block > max_bucket=64 → all dropped
    rows = [(i, f"same same same prefix words here tail{i}") for i in range(70)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert levenshtein_neardup(df, max_bucket=64).count() == 0
    # under the cap the block is alive
    assert levenshtein_neardup(df.limit(10), max_bucket=64).count() > 0


def test_length_band_prunes(spark):
    rows = [
        (1, "shared prefix words here and then x"),
        (2, "shared prefix words here and then xxxxxxxxxxxxxxxx"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # same block but length gap 15 > max_dist → no pair emitted
    assert levenshtein_neardup(df, max_dist=5).count() == 0
