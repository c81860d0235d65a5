"""lang_confusion: cell counts, ppm shares, null label/text routing."""

import pytest

from hnormalise_spark.ops.textops import lang_confusion


DOCS = [
    ("en", "the cat and the dog sat in the sun"),      # en detected
    ("en", "the big and small thing of it"),           # en detected
    ("en", "zzz qqq xxx"),                             # no evidence → und
    ("de", "der hund und die katze das ist gut"),      # de detected
    ("de", "the cat and the dog"),                     # mislabeled → en
    (None, "le chat et la table est une chose"),       # null label → und row
    ("es", None),                                      # null text → und pred
]


@pytest.fixture(scope="module")
def mat(spark):
    df = spark.createDataFrame(DOCS, "lang string, text string")
    return {
        (r.lang_declared, r.lang_pred): (r.n_docs, r.share_ppm)
        for r in lang_confusion(df).collect()
    }


def test_cells(spark, mat):
    assert mat[("en", "en")][0] == 2
    assert mat[("en", "und")][0] == 1
    assert mat[("de", "de")][0] == 1
    assert mat[("de", "en")][0] == 1
    assert mat[("und", "fr")][0] == 1   # null label coalesces to und
    assert mat[("es", "und")][0] == 1   # null text → und prediction
    assert sum(n for n, _ in mat.values()) == len(DOCS)


def test_shares_ppm(spark, mat):
    # en row: 2/3 and 1/3 in integer ppm (half-up)
    assert mat[("en", "en")][1] == 666667
    assert mat[("en", "und")][1] == 333333
    assert mat[("de", "de")][1] == 500000
    assert mat[("und", "fr")][1] == 1000000
