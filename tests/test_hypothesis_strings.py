"""Hypothesis-driven Spark==DuckDB string-semantics fuzzing
(SURVEY.md §5.3 rule 9, strengthened): random unicode payloads —
empty strings, multibyte, whitespace runs, combining marks — through
the string building blocks every §2.8 operator relies on.

Functions under test are the ones with engine-independent definitions
(codepoint length, substring, reverse, trim, concat, split, UTF-8
hashes).  Case mapping (upper/lower) is deliberately excluded here:
its edge behavior is locale-table-dependent and is pinned by the
fixed examples in test_edges.py instead.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# printable unicode minus surrogates/NUL; includes plenty of multibyte
_CHARS = st.characters(
    blacklist_categories=("Cs", "Cc"),
    max_codepoint=0x2FFFF,
)
_TEXTS = st.lists(st.text(_CHARS, max_size=40), min_size=1, max_size=8)

# reverse() diverges on combining marks (hypothesis-discovered, pinned
# in test_reverse_grapheme_divergence): Spark reverses codepoints,
# DuckDB reverses grapheme clusters.  Fuzz reverse without marks.
_CHARS_NO_MARKS = st.characters(
    blacklist_categories=("Cs", "Cc", "Mn", "Mc", "Me"),
    max_codepoint=0x2FFFF,
)
_TEXTS_NO_MARKS = st.lists(
    st.text(_CHARS_NO_MARKS, max_size=40), min_size=1, max_size=8
)

_SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _both(spark, texts):
    pdf = pd.DataFrame({"id": range(len(texts)), "s": texts})
    sdf = spark.createDataFrame(pdf)
    con = duckdb.connect()
    con.register("t", pdf)
    return sdf, con


def _cmp(sdf, con, spark_cols, duck_sql):
    got = sorted(tuple(r) for r in sdf.select("id", *spark_cols).collect())
    want = sorted(tuple(r) for r in con.execute(duck_sql).fetchall())
    assert got == want, f"spark={got}\nduck={want}"


@given(_TEXTS)
@_SETTINGS
def test_length_substring(spark, texts):
    sdf, con = _both(spark, texts)
    _cmp(
        sdf,
        con,
        [
            F.length("s").cast("long").alias("n"),
            F.substring("s", 2, 3).alias("sub"),
        ],
        "SELECT id, CAST(length(s) AS BIGINT), substring(s, 2, 3) FROM t",
    )


@given(_TEXTS_NO_MARKS)
@_SETTINGS
def test_reverse_no_marks(spark, texts):
    sdf, con = _both(spark, texts)
    _cmp(
        sdf,
        con,
        [F.reverse("s").alias("rev")],
        "SELECT id, reverse(s) FROM t",
    )


def test_reverse_grapheme_divergence(spark):
    """Pin the hypothesis-discovered divergence: on '0' + combining
    mark U+20D0, Spark reverse() reorders codepoints while DuckDB
    keeps the grapheme cluster intact.  No §2 operator applies
    reverse() to mark-bearing text; this documents the boundary."""
    s = "0⃐"
    (got,) = spark.createDataFrame([(s,)], "s string").select(
        F.reverse("s")
    ).first()
    assert got == "⃐0"  # codepoint reversal
    (want,) = duckdb.connect().execute("SELECT reverse(?)", [s]).fetchone()
    assert want == s  # grapheme cluster preserved


# trim() diverges on Unicode space separators (hypothesis-discovered,
# pinned below): DuckDB ltrim/rtrim strip the full Unicode whitespace
# set (e.g. U+00A0 NBSP), Spark strips ASCII space only.  Fuzz trim
# with Zs excluded and explicit ASCII-space padding instead.
_CHARS_NO_ZS = st.characters(
    blacklist_categories=("Cs", "Cc", "Zs", "Zl", "Zp"),
    max_codepoint=0x2FFFF,
)
_TEXTS_NO_ZS = st.lists(st.text(_CHARS_NO_ZS, max_size=40), min_size=1, max_size=8)


@given(_TEXTS_NO_ZS)
@_SETTINGS
def test_trim_concat(spark, texts):
    texts = [f"  {t} " for t in texts]
    sdf, con = _both(spark, texts)
    _cmp(
        sdf,
        con,
        [
            F.ltrim(F.rtrim("s")).alias("t"),
            F.concat(F.col("s"), F.lit("|"), F.col("s")).alias("c"),
        ],
        "SELECT id, ltrim(rtrim(s)), concat(s, '|', s) FROM t",
    )


def test_trim_nbsp_divergence(spark):
    """Pin the hypothesis-discovered divergence: DuckDB trims U+00A0
    (and other Unicode whitespace), Spark trims ASCII space only.  No
    §2 operator trims fixture text with non-ASCII whitespace; this
    documents the boundary."""
    s = "\xa0x\xa0"
    (got,) = spark.createDataFrame([(s,)], "s string").select(
        F.ltrim(F.rtrim("s"))
    ).first()
    assert got == s  # Spark: NBSP untouched
    (want,) = duckdb.connect().execute(
        "SELECT ltrim(rtrim(?))", [s]
    ).fetchone()
    assert want == "x"  # DuckDB: NBSP stripped


@given(_TEXTS)
@_SETTINGS
def test_utf8_hashes(spark, texts):
    sdf, con = _both(spark, texts)
    _cmp(
        sdf,
        con,
        [F.md5(F.col("s").cast("binary")).alias("h"), F.sha2(F.col("s").cast("binary"), 256).alias("h2")],
        "SELECT id, md5(s), sha256(s) FROM t",
    )


@given(_TEXTS)
@_SETTINGS
def test_split_on_fixed_sep(spark, texts):
    # embed a known separator so split has something to do
    texts = [t.replace(" ", ",") for t in texts]
    sdf, con = _both(spark, texts)
    _cmp(
        sdf,
        con,
        [F.split("s", ",").alias("parts")],
        "SELECT id, str_split(s, ',') FROM t",
    )
