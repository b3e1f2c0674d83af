"""WARC ingestion: parser round-trip (plain + per-record gzip), record
filtering, and the distributed read feeding the near-dup pipeline."""

import numpy as np
import pytest

from bloom_filters_spark.sources.warc import build_warc, parse_warc, read_warc


def _records():
    return [
        {"url": "https://a.example/1", "warc_ts": "2026-01-02T03:04:05Z",
         "html": b"<html><body><p>alpha bravo charlie delta</p></body></html>"},
        {"url": "https://a.example/1", "warc_ts": "2026-01-02T03:04:05Z",
         "html": b"GET / HTTP/1.1", "type": "request"},     # skipped
        {"url": "https://a.example/meta", "warc_ts": "2026-01-02T03:04:06Z",
         "html": b"{}", "type": "metadata"},                # skipped
        {"url": "https://b.example/2", "warc_ts": "2026-01-02T03:04:07Z",
         "html": b"<html><body><p>echo foxtrot golf hotel</p></body></html>"},
    ]


@pytest.mark.parametrize("gz", [False, True])
def test_parse_roundtrip(gz):
    payload = build_warc(_records(), gzip_members=gz)
    recs = parse_warc(payload)
    assert [r["url"] for r in recs] == ["https://a.example/1", "https://b.example/2"]
    assert recs[0]["html"] == _records()[0]["html"]
    assert recs[1]["html"] == _records()[3]["html"]
    assert str(recs[0]["warc_ts"]) == "2026-01-02 03:04:05+00:00"


def test_malformed_raises():
    with pytest.raises(ValueError):
        parse_warc(b"NOT A WARC\r\n\r\n")


def test_read_warc_to_near_dup(spark, tmp_path):
    """End-to-end: warc.gz files on disk → read_warc → pages_near_dup.
    Two files; one contains a near-duplicate of a page in the other."""
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark woods tonight")
    mutated = base.replace("dark", "cold")
    other = "completely different words describing another page entirely here"

    def page(url, ts, text):
        return {"url": url, "warc_ts": ts,
                "html": f"<html><body><p>{text}</p></body></html>".encode()}

    (tmp_path / "f1.warc.gz").write_bytes(build_warc(
        [page("https://x.example/a", "2026-01-01T00:00:00Z", base),
         page("https://x.example/b", "2026-01-01T00:00:01Z", other)],
        gzip_members=True,
    ))
    (tmp_path / "f2.warc.gz").write_bytes(build_warc(
        [page("https://y.example/c", "2026-01-01T00:00:02Z", mutated)],
        gzip_members=True,
    ))

    pages = read_warc(spark, str(tmp_path) + "/*.warc.gz")
    rows = {r["url"]: r for r in pages.collect()}
    assert len(rows) == 3
    assert bytes(rows["https://x.example/a"]["html"]).startswith(b"<html>")

    from bloom_filters_spark.pipeline import NearDupConfig, pages_near_dup

    clusters = {
        r["url"]: r["cluster_url"]
        for r in pages_near_dup(
            pages, NearDupConfig(threshold=0.6, verify="exact",
                                 num_hashes=128, bands=64),
            text_col=None,
        ).collect()
    }
    assert clusters["https://x.example/a"] == clusters["https://y.example/c"]
    assert clusters["https://x.example/b"] != clusters["https://x.example/a"]


def test_general_html_extraction(spark):
    """Real-world-ish html: scripts/styles/comments dropped, tags
    stripped, entities decoded, whitespace collapsed."""
    from pyspark.sql import functions as F

    from bloom_filters_spark.sources.pages import extract_text_general_expr

    html = (b"<html><head><title>T</title>"
            b"<style>body { color: red }</style>"
            b"<script type='text/js'>var x = '<p>fake</p>';</script></head>"
            b"<body><!-- nav comment --><div class='nav'>Home &amp; About</div>"
            b"<h1>Big   Title</h1><p>alpha &lt;3 bravo&nbsp;charlie</p>"
            b"</body></html>")
    df = spark.createDataFrame([(1, bytearray(html))], "id long, html binary")
    got = df.select(
        extract_text_general_expr(F.col("html")).alias("t")
    ).first()["t"]
    assert got == "T Home & About Big Title alpha <3 bravo charlie"


def test_http_body_chunked_and_compressed():
    """Real Common-Crawl payloads use Transfer-Encoding: chunked and
    Content-Encoding: gzip/deflate — the parser must undo both (chunked
    is the outer layer) and skip undecodable codings explicitly."""
    from bloom_filters_spark.sources.warc import build_warc, parse_warc

    html = b"<html><body>" + b"hello chunked world " * 50 + b"</body></html>"
    recs = [
        {"url": "http://a.example/plain", "html": html},
        {"url": "http://a.example/chunked", "html": html, "chunked": True},
        {"url": "http://a.example/gzip", "html": html, "encoding": "gzip"},
        {"url": "http://a.example/gzip-chunked", "html": html,
         "encoding": "gzip", "chunked": True},
        {"url": "http://a.example/deflate", "html": html,
         "encoding": "deflate"},
    ]
    parsed = {r["url"]: r["html"] for r in parse_warc(build_warc(recs))}
    assert set(parsed) == {r["url"] for r in recs}
    for url, body in parsed.items():
        assert body == html, url


def test_http_body_skips_unknown_or_malformed():
    from bloom_filters_spark.sources.warc import _http_body

    # unknown content coding → skipped, not emitted as garbage
    br = (b"HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n\r\n" + b"\x8b\x02\x80")
    assert _http_body(br) is None
    # malformed chunked framing → skipped
    bad = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
           b"zz\r\nnot-a-chunk")
    assert _http_body(bad) is None
    # truncated chunk → skipped
    trunc = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
             b"ff\r\nshort\r\n0\r\n\r\n")
    assert _http_body(trunc) is None
    # corrupt gzip → skipped
    gz = (b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n" + b"\x1f\x8bXX")
    assert _http_body(gz) is None
    # identity still passes through untouched
    ok = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>x</html>"
    assert _http_body(ok) == b"<html>x</html>"
