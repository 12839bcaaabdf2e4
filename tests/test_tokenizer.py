"""All four tokenizer implementations must agree (they feed engine, index,
numpy oracle, and DuckDB oracle respectively)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from smse_backend_spark.functions.tokenizer import (
    term_counts_frame,
    tokenize_col,
    tokenize_duckdb_sql,
    tokenize_py,
    tokenize_series,
)

CASES = [
    "fooBar baz_qux",
    "XMLHttpRequest parseHTML2Text",
    "def foo(self): return self.x + 1  # comment",
    "",
    "   ",
    "UPPER lower 123abc abc123 a1B2c3",
    "snake_case_name camelCaseName PascalCaseName SCREAMING_SNAKE",
    "tab\tnewline\nmixed-punct.,;:!?()[]{}<>",
    "unicode é ü ß — stripped to ascii runs",
    "a",
]


@pytest.mark.parametrize("text", CASES)
def test_py_vs_pandas(text):
    assert tokenize_series(pd.Series([text]))[0] == tokenize_py(text)


def test_py_vs_spark_column(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CASES)], "id long, content string")
    got = {r["id"]: r["toks"] for r in df.select("id", tokenize_col("content").alias("toks")).collect()}
    for i, t in enumerate(CASES):
        assert got[i] == tokenize_py(t), f"case {i}: {t!r}"


def test_py_vs_duckdb():
    con = duckdb.connect()
    for t in CASES:
        con.execute("create or replace table x as select ? as content", [t])
        got = con.execute(f"select {tokenize_duckdb_sql('content')} from x").fetchone()[0]
        assert list(got or []) == tokenize_py(t), repr(t)


def test_term_counts_frame_matches_counter():
    from collections import Counter

    texts = ["fooBar foo_bar fooBar", "", "def def def return"]
    out = term_counts_frame(pd.Series([0, 1, 2]), pd.Series(texts))
    for doc_id, text in enumerate(texts):
        want = Counter(tokenize_py(text))
        got = dict(
            zip(out[out.doc_id == doc_id]["term"], out[out.doc_id == doc_id]["tf"])
        )
        assert got == dict(want)
        if want:
            assert (out[out.doc_id == doc_id]["doc_len"] == len(tokenize_py(text))).all()


def test_extraction_equals_reference_algorithm_hypothesis():
    """Property: single-pass token extraction == replace-based reference."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from smse_backend_spark.functions.tokenizer import tokenize_py_reference

    alphabet = st.sampled_from(
        # U+0130 (dotted capital I) and U+212A (Kelvin sign) are the two
        # codepoints whose lowercase contains ASCII letters - folded by the
        # tokenizer spec, and exactly the class e-acute/eszett cannot detect
        list("abcXYZ019_ ./(){}\t\n-") + ["é", "ß", "\u0130", "\u212a"]
    )

    @settings(max_examples=500, deadline=None)
    @given(st.lists(alphabet, max_size=40).map("".join))
    def check(text):
        assert tokenize_py(text) == tokenize_py_reference(text), repr(text)

    check()


def test_term_counts_df_matches_pandas_kernel(spark):
    """The all-JVM tf pipeline (term_counts_df: array_sort + group-start
    Column algebra — the index build's default posting source) must be
    row-equal to the Arrow kernel on edge cases AND real corpus data."""
    from smse_backend_spark.functions.tokenizer import (
        TERM_COUNTS_LANG_SCHEMA,
        term_counts_df,
        term_counts_map_in_pandas,
    )
    from smse_backend_spark.session import ensure_pyfiles

    ensure_pyfiles(spark)
    edge = spark.createDataFrame(
        [(i, t, "en") for i, t in enumerate(CASES)]
        + [(100, None, "zh"), (101, "İstanbul Kelvin Kelvin", "de"),
           (102, "AAA aaa AaA AB2c HTML2parser", "en")],
        "doc_id long, content string, lang string",
    )
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet") \
        .selectExpr("doc_id", "text as content", "lang")
    for df in (edge, docs):
        a = sorted(map(tuple, term_counts_df(df).collect()))
        b = sorted(
            map(
                tuple,
                df.select("doc_id", "content", "lang")
                .mapInPandas(term_counts_map_in_pandas, TERM_COUNTS_LANG_SCHEMA)
                .collect(),
            )
        )
        assert a == b and len(a) > 0


def test_stemmed_term_counts_df_matches_pandas_kernel(spark):
    """The all-JVM stemmed tf pipeline (stem the token array pre-sort so
    collisions merge in the count) must be row-equal to the Arrow stemmed
    kernel — including docs where stemming merges terms ('table tables
    tablees') and plural-heavy real corpus rows."""
    from smse_backend_spark.functions.tokenizer import (
        TERM_COUNTS_LANG_SCHEMA,
        stemmed_term_counts_map_in_pandas,
        term_counts_df,
    )
    from smse_backend_spark.session import ensure_pyfiles

    ensure_pyfiles(spark)
    edge = spark.createDataFrame(
        [(0, "table tables tablees ties dies is", "en"),
         (1, "buses business classes class us", "en"),
         (2, None, "zh"), (3, "goes toes aes trees sees", "en")],
        "doc_id long, content string, lang string",
    )
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet") \
        .selectExpr("doc_id", "text as content", "lang")
    for df in (edge, docs):
        a = sorted(map(tuple, term_counts_df(df, analyzer="stem").collect()))
        b = sorted(
            map(
                tuple,
                df.select("doc_id", "content", "lang")
                .mapInPandas(
                    stemmed_term_counts_map_in_pandas, TERM_COUNTS_LANG_SCHEMA
                )
                .collect(),
            )
        )
        assert a == b and len(a) > 0


def test_term_counts_df_matches_python_reference_hypothesis(spark):
    """Property: the all-JVM tf pipeline == a plain-Python Counter over
    tokenize_py, on hypothesis-generated unicode text batches (one Spark
    job per batch of examples, not per example)."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from smse_backend_spark.functions.tokenizer import term_counts_df
    from smse_backend_spark.session import ensure_pyfiles

    ensure_pyfiles(spark)
    alphabet = st.sampled_from(
        list("abcXYZ019_ ./(){}\t\n-") + ["é", "ß", "İ", "K"]
    )

    texts: list[str] = []

    @settings(max_examples=300, deadline=None)
    @given(st.lists(alphabet, max_size=60).map("".join))
    def collect(text):
        texts.append(text)

    collect()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, content string"
    )
    got: dict[int, dict[str, int]] = {}
    lens: dict[int, int] = {}
    for r in term_counts_df(df).collect():
        got.setdefault(r["doc_id"], {})[r["term"]] = r["tf"]
        lens[r["doc_id"]] = r["doc_len"]
    for i, t in enumerate(texts):
        toks = tokenize_py(t)
        assert got.get(i, {}) == dict(Counter(toks)), repr(t)
        if toks:
            assert lens[i] == len(toks), repr(t)
