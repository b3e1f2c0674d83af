"""Paragraph-level dedup (operators/paragraphs.py): explode semantics,
per-doc dup stats, keep-first clean reassembly — all against tiny
hand-computable corpora (the driver-contract DuckDB oracle covers the
fixture-scale parity)."""

from pyspark.sql import functions as F


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_paragraphs_explode_trim_and_positions(spark):
    from bloom_filters_spark.operators.paragraphs import paragraphs

    df = _corpus(spark, [(1, "a\n  b  \n\nc"), (2, "   \n\n")])
    got = {
        (r["doc_id"], r["pos"], r["para"])
        for r in paragraphs(df).collect()
    }
    # blank / whitespace-only lines dropped, pos keeps ORIGINAL index
    assert got == {(1, 0, "a"), (1, 1, "b"), (1, 3, "c")}


def test_paragraphs_crlf_equals_lf(spark):
    """CRLF corpora must not grow '\\r'-suffixed phantom paragraphs:
    the same text with \\r\\n line endings yields byte-identical
    paragraph rows (so LF and CRLF copies of a doc dedup together)."""
    from bloom_filters_spark.operators.paragraphs import paragraphs

    lf = "first para\nsecond para\n\nthird para"
    crlf = lf.replace("\n", "\r\n") + "\r\n\t \r\n"
    df = _corpus(spark, [(1, lf), (2, crlf)])
    rows = {(r["doc_id"], r["pos"], r["para"])
            for r in paragraphs(df).collect()}
    p1 = {(p, t) for d, p, t in rows if d == 1}
    p2 = {(p, t) for d, p, t in rows if d == 2}
    assert p1 == p2 == {(0, "first para"), (1, "second para"),
                        (3, "third para")}


def test_paragraph_dup_stats_counts_cross_doc_only(spark):
    from bloom_filters_spark.operators.paragraphs import paragraph_dup_stats

    df = _corpus(
        spark,
        [
            (1, "shared\nunique1"),
            (2, "shared\nunique2\nunique2b"),
            # within-doc repetition alone is NOT a cross-doc dup
            (3, "solo\nsolo"),
        ],
    )
    got = {
        r["doc_id"]: (r["n_paras"], r["n_dup_paras"], r["dup_ratio_ppm"])
        for r in paragraph_dup_stats(df).collect()
    }
    assert got == {
        1: (2, 1, 500000),
        2: (3, 1, 333333),
        3: (2, 0, 0),
    }


def test_paragraph_dedup_clean_keep_first_and_order(spark):
    from bloom_filters_spark.operators.paragraphs import (
        paragraph_dedup_clean,
    )

    df = _corpus(
        spark,
        [
            (1, "alpha\nshared"),
            (2, "shared\nbeta\nshared"),   # loses BOTH occurrences
            (3, "shared"),                 # goes empty, must not vanish
            (4, "gamma\ngamma"),           # within-doc repeat survives
        ],
    )
    got = {
        r["doc_id"]: r["clean_text"]
        for r in paragraph_dedup_clean(df).collect()
    }
    assert got == {
        1: "alpha\nshared",  # min-id owner keeps it
        2: "beta",
        3: "",
        4: "gamma\ngamma",
    }


def test_paragraph_clean_is_idempotent(spark):
    from bloom_filters_spark.operators.paragraphs import (
        paragraph_dedup_clean,
    )

    df = _corpus(
        spark,
        [(1, "x\ny"), (2, "y\nz"), (3, "z\nx\nw")],
    )
    once = paragraph_dedup_clean(df)
    twice = paragraph_dedup_clean(
        once.select("doc_id", F.col("clean_text").alias("text"))
    )
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, twice.collect())
    )


def test_paragraph_dup_stats_every_doc_contract(spark):
    """A document with zero non-empty paragraphs reports 0/0/0 instead
    of vanishing — same every-doc contract as paragraph_dedup_clean, so
    per-doc joins of the stats never silently lose rows."""
    from bloom_filters_spark.operators.paragraphs import paragraph_dup_stats

    df = _corpus(spark, [(1, "a\nb"), (2, "   \n\n"), (3, "")])
    got = {
        r["doc_id"]: (r["n_paras"], r["n_dup_paras"], r["dup_ratio_ppm"])
        for r in paragraph_dup_stats(df).collect()
    }
    assert set(got) == {1, 2, 3}
    assert got[2] == (0, 0, 0) and got[3] == (0, 0, 0)
    assert got[1] == (2, 0, 0)
