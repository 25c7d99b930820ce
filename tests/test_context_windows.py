"""Sliding context windows (operators/context_windows.py): the JVM
generate path and the Python UDTF lateral-join path agree
byte-for-byte, with tail/empty/short-doc edges pinned."""

from pyspark.sql import functions as F

from data_pipeline_project_spark.operators.context_windows import (
    make_expand_windows_udtf,
    sliding_token_windows,
)

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_jvm_and_udtf_paths_agree_on_corpus(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    jvm = sliding_token_windows(docs, size=32, overlap=8)

    spark.udtf.register("expand_windows", make_expand_windows_udtf(32, 8))
    docs.createOrReplaceTempView("v_docs_cw")
    sql = spark.sql(
        """
        SELECT doc_id, w.window_no, w.window_text, w.n_tokens
        FROM v_docs_cw, LATERAL expand_windows(text) AS w
        """
    )
    assert _rows(jvm) == _rows(sql)
    # non-vacuous: the corpus really fans out into multiple windows
    assert jvm.count() > docs.count()


def test_window_rule_edges(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),   # 10 toks: windows at 0,3,6,9
            (2, "one two"),               # shorter than one window
            (3, ""),                      # zero tokens -> zero windows
            (4, "x " * 4),                # exact multiple of step
        ],
        "doc_id long, text string",
    )
    out = sliding_token_windows(docs, size=4, overlap=1)
    rows = {
        (r.doc_id, r.window_no): (r.window_text, r.n_tokens)
        for r in out.collect()
    }
    assert rows[(1, 0)] == ("a b c d", 4)
    assert rows[(1, 1)] == ("d e f g", 4)
    assert rows[(1, 2)] == ("g h i j", 4)
    assert rows[(1, 3)] == ("j", 1)        # short tail window
    assert rows[(2, 0)] == ("one two", 2)
    assert not any(d == 3 for d, _ in rows)  # empty doc: no windows
    # overlap contract: consecutive windows share `overlap` tokens
    assert rows[(1, 0)][0].split()[-1] == rows[(1, 1)][0].split()[0]

    import pytest

    with pytest.raises(ValueError, match="overlap < size"):
        sliding_token_windows(docs, size=4, overlap=4)
    with pytest.raises(ValueError, match="overlap < size"):
        make_expand_windows_udtf(4, 5)
