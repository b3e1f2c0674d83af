"""Deterministic synthetic Common-Crawl-style ``pages`` corpus.

Matches the input contract (BASELINE.json ``input_hint``):
``pages(url string, warc_ts timestamp, html binary, text string,
lang string)`` — plus a ``truth_pairs(id1, id2, jaccard)`` ground-truth
side table of planted near-duplicates (FIXTURES.md §1).

Duplicate planting: a fraction of docs get mutated copies at controlled
token-substitution rates targeting exact w-shingle Jaccard ~1.0 / ~0.9 /
~0.7 / ~0.5, plus <0.2 background.  One boilerplate template shared by
~1% of docs exercises hot-band skew.

Everything is a pure function of (n_docs, seed) — no external data, no
ambient state; generation is distributed (mapInPandas over an id range)
so it scales with the cluster.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# target Jaccard levels for planted duplicate pairs: substitution rate →
# approx shingle-Jaccard for w=3 (each substituted token kills ~w shingles)
DUP_LEVELS = [0.0, 0.01, 0.03, 0.07]  # ~1.0, ~0.9, ~0.75, ~0.55
VOCAB_SIZE = 5000
DOC_LEN_RANGE = (40, 200)
BOILERPLATE_FRACTION = 0.01
DUP_FRACTION = 0.25

_HTML_TEMPLATE = (
    "<html><head><title>doc {i}</title></head><body><p>{text}</p></body></html>"
)


def _vocab() -> np.ndarray:
    return np.array([f"w{i:04d}" for i in range(VOCAB_SIZE)])


def _base_doc_tokens(i: int, rng: np.random.Generator, vocab: np.ndarray) -> np.ndarray:
    n = int(rng.integers(*DOC_LEN_RANGE))
    return vocab[rng.integers(0, len(vocab), n)]


def _mutate(tokens: np.ndarray, rate: float, rng: np.random.Generator,
            vocab: np.ndarray) -> np.ndarray:
    out = tokens.copy()
    if rate > 0:
        n_mut = max(1, int(len(tokens) * rate))
        pos = rng.choice(len(tokens), size=n_mut, replace=False)
        out[pos] = vocab[rng.integers(0, len(vocab), n_mut)]
    return out


def generate_pages_pdf(doc_ids: np.ndarray, seed: int = 42) -> pd.DataFrame:
    """Generate one batch of pages rows, pure function of (doc_ids, seed).

    Even doc ids are originals; ``doc_id = 2k+1`` is a mutated copy of
    ``2k`` when k falls in the dup fraction, else an independent doc.
    A deterministic ~1% of docs share a boilerplate prefix (hot band).
    """
    vocab = _vocab()
    langs = np.array(["en", "en", "en", "en", "de", "fr", "es", "it"])
    boiler = " ".join(f"b{j:02d}" for j in range(60))
    rows = []
    for i in doc_ids.tolist():
        base_id = (i // 2) * 2
        rng = np.random.default_rng((seed, base_id))
        toks = _base_doc_tokens(base_id, rng, vocab)
        is_copy = (i % 2 == 1) and (rng.random() < DUP_FRACTION)
        if i % 2 == 1:
            if is_copy:
                level = DUP_LEVELS[int(rng.integers(0, len(DUP_LEVELS)))]
                rng_i = np.random.default_rng((seed, i, 1))
                toks = _mutate(toks, level, rng_i, vocab)
            else:
                rng_i = np.random.default_rng((seed, i, 2))
                toks = _base_doc_tokens(i, rng_i, vocab)
        text = " ".join(toks.tolist())
        rng_b = np.random.default_rng((seed, i, 3))
        if rng_b.random() < BOILERPLATE_FRACTION:
            text = boiler + " " + text
        lang = str(langs[int(np.random.default_rng((seed, i, 4)).integers(0, len(langs)))])
        rows.append(
            {
                "doc_id": int(i),
                "url": f"https://site{i % 97}.example/p/{i}",
                "warc_ts": pd.Timestamp("2026-01-01", tz="UTC")
                + pd.Timedelta(seconds=int(i)),
                "html": _HTML_TEMPLATE.format(i=i, text=text).encode("utf-8"),
                "text": text,
                "lang": lang,
            }
        )
    return pd.DataFrame(rows)


PAGES_SCHEMA = (
    "doc_id long, url string, warc_ts timestamp, html binary, text string, lang string"
)


def pages_table(spark: SparkSession, n_docs: int, seed: int = 42,
                partitions: int | None = None) -> DataFrame:
    """Distributed deterministic pages table — generation happens on the
    executors (mapInPandas over an id range), so it scales."""
    partitions = partitions or max(spark.sparkContext.defaultParallelism, 4)
    ids = spark.range(0, n_docs, 1, partitions)

    def gen(batches):
        for pdf in batches:
            yield generate_pages_pdf(pdf["id"].to_numpy(), seed)

    return ids.mapInPandas(gen, PAGES_SCHEMA)


def truth_pairs(spark: SparkSession, n_docs: int, seed: int = 42,
                w: int = 3, min_jaccard: float = 0.2) -> DataFrame:
    """Ground-truth side table (FIXTURES.md §1): for every planted
    original/copy pair ``(2k, 2k+1)``, the EXACT w-shingle Jaccard of
    the two texts (string shingles — collision-free truth).  Pairs below
    ``min_jaccard`` (independent odd docs) are omitted.

    Pure function of (n_docs, seed), distributed like ``pages_table``;
    recall benches join pipeline pairs against this table.
    """
    half = spark.range(0, n_docs // 2, 1,
                       max(spark.sparkContext.defaultParallelism, 4))

    def shingle_set(text: str) -> set:
        toks = text.split()
        n = max(len(toks) - w + 1, 1)
        return {" ".join(toks[i: i + w]) for i in range(n)}

    def gen(batches):
        for pdf in batches:
            base_ids = (pdf["id"].to_numpy() * 2).astype(np.int64)
            both = generate_pages_pdf(
                np.sort(np.concatenate([base_ids, base_ids + 1])), seed
            ).set_index("doc_id")
            rows = []
            for b in base_ids.tolist():
                if b + 1 >= n_docs:
                    continue
                sa = shingle_set(both.loc[b, "text"])
                sb = shingle_set(both.loc[b + 1, "text"])
                j = len(sa & sb) / max(len(sa | sb), 1)
                if j >= min_jaccard:
                    rows.append({"id1": b, "id2": b + 1, "jaccard": j})
            yield pd.DataFrame(rows, columns=["id1", "id2", "jaccard"])

    return half.mapInPandas(gen, "id1 long, id2 long, jaccard double")


def extract_text_expr(html_col):
    """html binary → text, byte-identical per url (input_hint contract).

    The synthetic html wraps text in <p>…</p>; extraction is a pure
    deterministic JVM expression (regexp over the decoded body).
    """
    body = F.decode(html_col, "UTF-8")
    return F.regexp_extract(body, r"<p>(.*)</p>", 1)


def extract_text_general_expr(html_col):
    """General html binary → visible text for real-world pages (WARC
    ingest): drop script/style/comment blocks, strip tags, decode the
    common entities, collapse whitespace.  Entirely JVM regexp
    expressions — codegen'd, no Python, scale-safe.  Deterministic pure
    function of the bytes (the input_hint invariant), but NOT
    byte-identical to ``extract_text_expr`` on the synthetic corpus —
    use the simple extractor where parity with the fixtures matters."""
    body = F.decode(html_col, "UTF-8")
    no_blocks = F.regexp_replace(
        body, r"(?is)<(script|style)[^>]*>.*?</\1\s*>", " "
    )
    no_comments = F.regexp_replace(no_blocks, r"(?s)<!--.*?-->", " ")
    no_tags = F.regexp_replace(no_comments, r"<[^>]*>", " ")
    ent = no_tags
    for src, dst in (("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"),
                     ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'")):
        ent = F.replace(ent, F.lit(src), F.lit(dst))
    return F.trim(F.regexp_replace(ent, r"\s+", " "))
