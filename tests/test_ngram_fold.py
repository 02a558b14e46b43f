"""Property tests for dedup.ngram_fold_sql — the zip_with fold that
replaced the quadratic transform(sequence) spelling in round 4. The fold
must produce exactly the n-grams a plain Python reference produces, for
any token list and any n, including the degenerate shapes (empty text,
fewer words than n, n == 1)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cdc_stream_batch_etl_spark.dedup import SHINGLE_N, ngram_fold_sql, shingles_col


def _py_ngrams(words: list[str], n: int) -> list[str]:
    return [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]


# tokens without spaces (the splitter's contract) and non-empty
_token = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")), min_size=1, max_size=6
)


@pytest.fixture(scope="module")
def fold_eval(spark):
    from pyspark.sql import functions as F

    def run(words: list[str], n: int) -> list[str]:
        df = spark.createDataFrame([(words,)], "words array<string>")
        return df.select(F.expr(ngram_fold_sql("words", n)).alias("g")).collect()[0].g

    return run


@settings(max_examples=25, deadline=None)
@given(words=st.lists(_token, min_size=0, max_size=12), n=st.integers(1, 5))
def test_fold_matches_python_reference(fold_eval, words, n):
    assert fold_eval(words, n) == _py_ngrams(words, n)


def test_fold_degenerate_shapes(fold_eval):
    assert fold_eval([], 3) == []
    assert fold_eval(["a"], 3) == []
    assert fold_eval(["a", "b"], 3) == []
    assert fold_eval(["a", "b", "c"], 3) == ["a b c"]
    assert fold_eval(["a", "b", "c"], 1) == ["a", "b", "c"]


def test_shingles_col_matches_reference(spark):
    from pyspark.sql import functions as F

    texts = ["one two three four five", "x", "", "a b a b a b"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r.s for r in df.select(shingles_col("text").alias("s")).collect()]
    for t, s in zip(texts, got):
        words = t.split(" ")
        expected = list(dict.fromkeys(_py_ngrams(words, SHINGLE_N)))  # distinct, order-kept
        assert s == expected, (t, s, expected)
