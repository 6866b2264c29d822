"""Hypothesis property tests (SURVEY.md §5.3): engine expressions must match
their Python reference semantics on arbitrary (ASCII) inputs, batched through
one DataFrame per example set for Spark-roundtrip economy."""

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from datamunging_spark.functions import (
    cast_int_hive,
    normalize_text,
    tokenize,
)

# ASCII-only: Spark's regex \s is ASCII by default while Python str.split()
# handles unicode whitespace — a documented boundary, not a parity target.
_ascii_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=60
)


@settings(max_examples=5, deadline=None)
@given(st.lists(_ascii_text, min_size=1, max_size=30))
def test_tokenize_matches_python_split(spark, texts):
    """R22: tokenize == str.split(' ') including empty tokens."""
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "t"])
    got = {
        r["i"]: r["toks"]
        for r in df.select("i", tokenize("t").alias("toks")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == t.split(" "), repr(t)


@settings(max_examples=5, deadline=None)
@given(st.lists(_ascii_text, min_size=1, max_size=30))
def test_normalize_matches_python(spark, texts):
    """X1 canonical form == ' '.join(s.lower().split())."""
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "t"])
    got = {
        r["i"]: r["n"]
        for r in df.select("i", normalize_text("t").alias("n")).collect()
    }
    import re

    for i, t in enumerate(texts):
        assert got[i] == re.sub(r"\s+", " ", t.lower()).strip(), repr(t)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.integers(-(2**31), 2**31 - 1).map(str),
            st.integers(-(2**31), 2**31 - 1).map(lambda x: f"  {x} "),
            _ascii_text,
        ),
        min_size=1,
        max_size=30,
    )
)
def test_cast_int_hive_matches_python(spark, values):
    """R18: trim + int() on success, NULL on failure (Hive semantics)."""
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], ["i", "v"]
    )
    got = {
        r["i"]: r["c"]
        for r in df.select("i", cast_int_hive("v").alias("c")).collect()
    }

    def pyref(v: str):
        s = v.strip()
        try:
            n = int(s)
        except ValueError:
            return None
        return n if -(2**31) <= n <= 2**31 - 1 else None

    for i, v in enumerate(values):
        assert got[i] == pyref(v), repr(v)
