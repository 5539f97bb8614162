"""Golden cross-engine whitespace tests.

Round-3's only red driver row (``sequence_packing_plan``) was a
data-dependent divergence between Java-regex ``\\s`` (includes \\x0B) and
RE2 ``\\s`` (does not), and the follow-up fuzz found a second trap:
DuckDB's one-arg ``TRIM`` strips Unicode whitespace while Spark's ``trim``
strips only ASCII space. These tests pin the portable spellings
(``WS_CLASS`` / ``ws_trim`` ≡ ``TRIM(s, <explicit set>)``) on a synthetic
corpus seeded with every character either engine could treat specially:
vertical tab, form feed, CR, NBSP, ideographic space, zero-width space,
ASCII controls, and leading/trailing separators (empty-edge tokens).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from alibaba_cppfeaturestore_spark.functions import text as TX

EXOTIC_DOCS = [
    "plain words here",
    "a\x0bb c",                      # vertical tab: Java-\s yes, RE2-\s no
    "\x0bleading vt",                # leading separator -> empty first token
    "trailing vt\x0b",               # trailing separator -> empty last token
    "form\x0cfeed and\rcr",
    "tab\t\truns",
    "nbsp stays one token",     # NBSP is NOT in the portable class
    "　ideographic edges　",  # DuckDB one-arg TRIM strips these
    "zero​width",
    "ctrl\x01char",
    "  double  spaces  ",
    "",
    " ",
    "\x0b",
    "mixed 　 \x0b\t end",
    # unicode case-fold divergence carriers (r10 full-BMP sweep): Java's
    # full/contextual lower() vs utf8proc's simple mapping disagree on
    # exactly these classes — portable_lower must neutralize them all
    "İstanbul DİYARBAKIR",   # İ: Java lower expands to i+U+0307
    "ΣΣ Ο ΣΙΣΥΦΟΣ",              # final-sigma contextual rule
    "ᲉⰯꟀꟋꟜ", # modern cased letters utf8proc lacks
    "STRASSE ß ẞ",                     # ß/ẞ (upper diverges; lower must not)
    "ﬁligature ǅungla Ǆ",              # ligature/titlecase digraphs
    "é é composed-vs-combining",
    "😀 non-BMP emoji 𐒰",
]

WS_SQL_SET = TX.WS_TRIM_SQL


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(EXOTIC_DOCS)], "doc_id int, text string"
    )


def _duck(sql_expr: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id INTEGER, text VARCHAR)")
    con.executemany(
        "INSERT INTO d VALUES (?, ?)", list(enumerate(EXOTIC_DOCS))
    )
    return con.execute(
        f"SELECT doc_id, {sql_expr} AS v FROM d ORDER BY doc_id"
    ).fetchdf()


def _spark_vals(docs_df, col):
    return [
        r.v for r in docs_df.select("doc_id", col.alias("v")).orderBy("doc_id").collect()
    ]


def test_tokens_match_duckdb(docs_df):
    got = _spark_vals(docs_df, TX.tokens("text"))
    want = _duck(
        f"regexp_split_to_array(TRIM(text, {WS_SQL_SET}), '{TX.TOKEN_SPLIT_REGEX}')"
    )["v"].tolist()
    assert [list(g) for g in got] == [list(w) for w in want]


def test_token_count_matches_duckdb(docs_df):
    got = _spark_vals(docs_df, TX.token_count("text"))
    want = _duck(
        f"LEN(regexp_split_to_array(TRIM(text, {WS_SQL_SET}), '{TX.TOKEN_SPLIT_REGEX}'))"
    )["v"].tolist()
    assert got == want


def test_ws_trim_matches_duckdb(docs_df):
    got = _spark_vals(docs_df, TX.ws_trim("text"))
    want = _duck(f"TRIM(text, {WS_SQL_SET})")["v"].tolist()
    assert got == want


def test_nonws_length_matches_duckdb(docs_df):
    got = _spark_vals(
        docs_df,
        F.length(F.regexp_replace(TX.ws_trim("text"), TX.WS_CLASS, "")),
    )
    want = _duck(
        f"LENGTH(regexp_replace(TRIM(text, {WS_SQL_SET}), '{TX.WS_CLASS}', '', 'g'))"
    )["v"].tolist()
    assert got == want


def test_fingerprint_md5_matches_duckdb(docs_df):
    got = _spark_vals(docs_df, TX.fingerprint_md5("text"))
    norm = TX.portable_lower_sql(
        f"regexp_replace(TRIM(text, {WS_SQL_SET}), '{TX.TOKEN_SPLIT_REGEX}', ' ', 'g')"
    )
    want = _duck(f"md5({norm})")["v"].tolist()
    assert got == want


def test_portable_lower_matches_duckdb_on_divergence_carriers(docs_df):
    """portable_lower neutralizes every codepoint where Spark (Java full
    case mapping) and DuckDB (utf8proc simple mapping) disagree — İ,
    contextual final sigma, and the 13 modern cased letters. The carrier
    docs above would FAIL this test under bare lower()."""
    got = _spark_vals(docs_df, TX.portable_lower(F.col("text")))
    want = _duck(TX.portable_lower_sql("text"))["v"].tolist()
    assert got == want


def test_bare_lower_is_not_portable(docs_df):
    """Sanity: the carriers genuinely diverge under bare lower() — if
    this ever starts passing, the engines converged and the prefold can
    be retired."""
    got = _spark_vals(docs_df, F.lower(F.col("text")))
    want = _duck("lower(text)")["v"].tolist()
    assert got != want


def test_one_arg_trim_is_not_portable():
    """Documents WHY the explicit set exists: one-arg TRIM diverges."""
    con = duckdb.connect()
    stripped = con.execute("SELECT TRIM('　x　')").fetchone()[0]
    assert stripped == "x"  # DuckDB strips ideographic space...
    # ...Spark's trim() does not (pinned via btrim equivalence above).
