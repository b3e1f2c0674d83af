"""Unit tests for URL canonicalization and repetition metrics against
small pure-Python oracles."""

import math
import re

import pytest
from pyspark.sql import functions as F

from bloom_filters_spark.functions.text import (
    dup_word_frac_expr,
    repetition_stats,
    top_ngram_char_frac_expr,
)
from bloom_filters_spark.functions.url import canonicalize_url_expr


def _canon_py(url: str) -> str:
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://", url)
    if not m:
        return re.sub(r"#.*$", "", url)
    scheme = m.group(1).lower()
    host = re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", url).group(1).lower()
    host = re.sub(r"^www\.", "", host)
    if scheme == "http":
        host = re.sub(r":80$", "", host)
    elif scheme == "https":
        host = re.sub(r":443$", "", host)
    rest = re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", url).group(1)
    rest = re.sub(r"([?&])(utm_[A-Za-z0-9_]+|gclid|fbclid|ref)=[^&#]*", r"\1", rest)
    rest = re.sub(r"\?&+", "?", rest)
    rest = re.sub(r"&&+", "&", rest)
    rest = re.sub(r"[?&]+$", "", rest)
    if "?" not in rest:
        rest = re.sub(r"/+$", "", rest)
    if rest == "":
        rest = "/"
    return f"{scheme}://{host}{rest}"


URLS = [
    "HTTPS://WWW.Example.COM:443/Path/To?utm_source=x&id=5#frag",
    "http://example.com:80/",
    "http://example.com:8080/keep-port",
    "https://example.com/a/b/?utm_campaign=c&utm_medium=m",
    "https://example.com/a?id=1&gclid=abc&x=2",
    "https://example.com/a?fbclid=only",
    "https://sub.www-like.com/x//",
    "https://example.com",
    "ftp://Example.com:443/File",
    "not a url #fragment",
    "https://example.com/a?ref=feed&utm_a=1&utm_b=2",
]


def test_canonicalize_url_matches_python_oracle(spark):
    df = spark.createDataFrame([(u,) for u in URLS], "url string")
    got = [r["c"] for r in
           df.select(canonicalize_url_expr(F.col("url")).alias("c")).collect()]
    assert got == [_canon_py(u) for u in URLS]


def test_canonicalize_url_specific_cases(spark):
    df = spark.createDataFrame([(u,) for u in URLS], "url string")
    got = {u: r["c"] for u, r in zip(URLS, df.select(
        canonicalize_url_expr(F.col("url")).alias("c")).collect())}
    assert got[URLS[0]] == "https://example.com/Path/To?id=5"
    assert got["http://example.com:80/"] == "http://example.com/"
    assert got["http://example.com:8080/keep-port"] == \
        "http://example.com:8080/keep-port"
    assert got["https://example.com/a?fbclid=only"] == "https://example.com/a"
    assert got["https://example.com"] == "https://example.com/"
    assert got["ftp://Example.com:443/File"] == "ftp://example.com:443/File"
    assert got["not a url #fragment"] == "not a url "
    assert got["https://example.com/a?ref=feed&utm_a=1&utm_b=2"] == \
        "https://example.com/a"


def _rep_py(text: str, n: int):
    toks = [t for t in re.split(r"\s+", text.lower()) if t]
    if len(toks) < n:
        return 0
    grams = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
    best = max(grams.count(g) * len(g) for g in grams)
    total = len(" ".join(toks))
    return math.floor(best / (total if total else 1) * 1000000.0)


TEXTS = [
    "a b a b a b c d the end the end",
    "unique words only here now",
    "x",
    "",
    "spam spam spam spam spam",
]


@pytest.mark.parametrize("n", [2, 3])
def test_top_ngram_frac_matches_python(spark, n):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    got = [r["v"] for r in df.select(
        top_ngram_char_frac_expr(F.col("text"), n, ppm=True).alias("v")
    ).collect()]
    assert got == [_rep_py(t, n) for t in TEXTS]


def test_repetition_stats_matches_expr_form(spark):
    """The scalable explode→hash-agg form must be bit-identical to the
    quadratic expression form (same IEEE ops, same floor·10⁶)."""
    df = spark.createDataFrame(list(enumerate(TEXTS)), "doc_id long, text string")
    got = {r["doc_id"]: (r["dup_word_ppm"], r["top2gram_ppm"], r["top3gram_ppm"])
           for r in repetition_stats(df).collect()}
    want = {r["doc_id"]: (r["d"], r["g2"], r["g3"]) for r in df.select(
        "doc_id",
        dup_word_frac_expr(F.col("text"), ppm=True).alias("d"),
        top_ngram_char_frac_expr(F.col("text"), 2, ppm=True).alias("g2"),
        top_ngram_char_frac_expr(F.col("text"), 3, ppm=True).alias("g3"),
    ).collect()}
    assert got == want


def test_dup_word_frac(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    got = [r["v"] for r in df.select(
        dup_word_frac_expr(F.col("text"), ppm=True).alias("v")).collect()]

    def oracle(t):
        toks = [x for x in re.split(r"\s+", t.lower()) if x]
        if not toks:
            return 0
        return math.floor((1.0 - len(set(toks)) / len(toks)) * 1000000.0)

    assert got == [oracle(t) for t in TEXTS]
