"""Exact-substring (suffix-array) dedup: kernel properties + Spark
pipeline parity against a brute-force Python oracle."""

import numpy as np
import pytest

from bloom_filters_spark.operators.substring import (
    _lcp_kasai,
    _suffix_array,
    lcs_token_len,
)


def _brute_lcs(a, b):
    best = 0
    prev = np.zeros(len(b), dtype=int)
    for i in range(len(a)):
        cur = np.zeros(len(b), dtype=int)
        eq = b == a[i]
        cur[eq] = 1
        if i > 0:
            cur[1:][eq[1:]] = prev[:-1][eq[1:]] + 1
        if len(cur):
            best = max(best, int(cur.max()))
        prev = cur
    return best


def test_suffix_array_sorts_suffixes():
    rng = np.random.default_rng(7)
    for _ in range(50):
        s = rng.integers(0, 4, rng.integers(1, 30))
        sa = _suffix_array(s.astype(np.int64))
        suf = [tuple(s[i:]) for i in sa]
        assert suf == sorted(suf)


def test_lcp_matches_bruteforce():
    rng = np.random.default_rng(11)
    for _ in range(30):
        s = rng.integers(0, 3, rng.integers(2, 25)).astype(np.int64)
        sa = _suffix_array(s)
        lcp = _lcp_kasai(s, sa)
        for r in range(1, len(s)):
            i, j = sa[r], sa[r - 1]
            h = 0
            while i + h < len(s) and j + h < len(s) and s[i + h] == s[j + h]:
                h += 1
            assert lcp[r] == h


def test_lcs_matches_dp_bruteforce():
    rng = np.random.default_rng(42)
    for _ in range(200):
        v = rng.integers(2, 6)
        a = rng.integers(0, v, rng.integers(0, 40))
        b = rng.integers(0, v, rng.integers(0, 40))
        assert lcs_token_len(a, b) == _brute_lcs(a, b)


def _mini_docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again ok"
    rows = [
        (0, base + " unique tail zero alpha beta gamma delta epsilon"),
        (1, base + " unique tail one alpha beta gamma delta epsilon"),
        (2, "totally different text with no overlap at all here truly"),
        (3, base),           # exact prefix-substring of 0 and 1
        (4, "short doc"),    # < L tokens: must emit nothing
        (5, None),           # null text
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_grams(text, L):
    toks = [t for t in text.lower().split() if t]
    return {
        " ".join(toks[i : i + L]) for i in range(len(toks) - L + 1)
    } if len(toks) >= L else set()


def test_substring_dup_pairs_parity(spark):
    from bloom_filters_spark.operators.substring import substring_dup_pairs

    L = 8
    docs = _mini_docs(spark)
    got = {
        (r["id1"], r["id2"]): r["n_shared"]
        for r in substring_dup_pairs(docs, L=L).collect()
    }
    texts = {r["doc_id"]: r["text"] for r in docs.collect() if r["text"]}
    want = {}
    ids = sorted(texts)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            shared = _py_grams(texts[ids[i]], L) & _py_grams(texts[ids[j]], L)
            if shared:
                want[(ids[i], ids[j])] = len(shared)
    assert got == want
    assert all(k[0] not in (4, 5) and k[1] not in (4, 5) for k in got)


def test_substring_lcs_pairs_parity(spark):
    from bloom_filters_spark.operators.substring import substring_lcs_pairs

    docs = _mini_docs(spark)
    got = {
        (r["id1"], r["id2"]): r["lcs_tokens"]
        for r in substring_lcs_pairs(docs, L=8).collect()
    }
    texts = {r["doc_id"]: r["text"] for r in docs.collect() if r["text"]}

    def tok(t):
        return [x for x in t.lower().split() if x]

    for (i, j), lcs in got.items():
        a, b = tok(texts[i]), tok(texts[j])
        u = {t: k for k, t in enumerate(sorted(set(a + b)))}
        want = _brute_lcs(
            np.array([u[t] for t in a]), np.array([u[t] for t in b])
        )
        assert lcs == want and lcs >= 8
    # doc 3 is a verbatim substring of docs 0 and 1
    assert (0, 3) in got and (1, 3) in got and (0, 1) in got


def test_decontamination_flags(spark):
    from bloom_filters_spark.operators.substring import decontamination_flags

    eight = "t1 t2 t3 t4 t5 t6 t7 t8"
    train = spark.createDataFrame(
        [
            (1, f"intro {eight} outro"),        # shares the 8-gram
            (2, "a b c d e f g h i j"),         # clean
            (3, "t1 t2 t3 t4 t5 t6 t7"),        # 7 tokens: no grams at all
            (4, f"{eight} mid {eight}"),        # several shared grams
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, f"prefix {eight} suffix")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_contaminated_grams"], r["contaminated"])
        for r in decontamination_flags(train, bench, L=8).collect()
    }
    assert got[1] == (1, True)
    assert got[2] == (0, False)
    assert got[3] == (0, False)   # sub-L docs present, unflagged
    # doc 4: distinct shared grams = the 8-gram itself plus the rolling
    # grams of "... t8 mid t1 ..." that also occur in bench?  none do,
    # but "t1..t8" appears twice -> counted ONCE (per-doc distinct)
    assert got[4] == (1, True)
    assert set(got) == {1, 2, 3, 4}


def test_candidate_and_verify_tokenizers_agree_non_ascii(spark):
    """The candidate pass hashes ASCII-lowered, ASCII-whitespace
    tokens; the verify tokenizer must be byte-identical, or pairs
    sharing a gram under ONE tokenizer but not the other silently
    come apart.  Non-ASCII case variants must therefore NOT pair
    (neither side case-folds 'É' to 'é'), and identical non-ASCII
    bytes must pair."""
    from bloom_filters_spark.operators.substring import substring_dup_pairs

    eight = " ".join(f"école{i}" for i in range(8))
    upper = " ".join(f"ÉCOLE{i}" for i in range(8))
    df = spark.createDataFrame(
        [
            (1, f"a b c {eight} d e f"),
            (2, f"x y {eight} z w"),       # same bytes → must pair
            (3, f"x y {upper} z w"),       # case differs only in É → no pair
        ],
        "doc_id long, text string",
    )
    pairs = {(r["id1"], r["id2"])
             for r in substring_dup_pairs(df, L=8).select("id1", "id2").collect()}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)
