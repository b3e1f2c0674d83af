"""Text-analysis columns for a training-data pipeline — all built-in
Spark SQL expressions (JVM codegen, no Python) so they compose with
scans and push down around them.

Each function returns a Column; oracle-SQL equivalents live in
``__spark_entry__.oracle_sql`` (DuckDB dialect).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword seeds for the n-gram/stopword heuristic
# (Latin-script languages — non-Latin scripts are gated by codepoint
# ranges in lang_id_expr before the vote ever runs)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "nicht"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"],
    "es": ["el", "la", "los", "de", "que", "y", "en", "un", "una", "es"],
    "it": ["il", "che", "di", "e", "per", "con", "sono", "del", "non", "si"],
    "pt": ["o", "os", "do", "da", "em", "para", "com", "uma", "não", "mais"],
    "nl": ["het", "een", "van", "ik", "dat", "niet", "zijn", "op", "te", "maar"],
    "sv": ["och", "att", "det", "som", "på", "är", "av", "för", "med", "har"],
    "pl": ["i", "w", "nie", "się", "na", "jest", "że", "do", "tak", "jak"],
    "tr": ["bir", "ve", "bu", "için", "ile", "daha", "ne", "gibi", "çok", "ama"],
}

# BMP codepoint ranges per script — literal chars so the identical
# character-class works in Java regex (Spark) and RE2 (DuckDB oracle)
SCRIPT_RANGES = {
    "kana": ("\u3040", "\u30ff"),        # hiragana + katakana
    "hangul": ("\uac00", "\ud7af"),
    "han": ("\u4e00", "\u9fff"),
    "cyrillic": ("\u0400", "\u04ff"),
    "arabic": ("\u0600", "\u06ff"),
    "devanagari": ("\u0900", "\u097f"),
    "greek": ("\u0370", "\u03ff"),
    "hebrew": ("\u0590", "\u05ff"),
}

# ordered gates: first match wins.  (lang, script, num, den) reads
# "count*num >= nonspace*den", i.e. script ratio >= den/num — integer
# arithmetic only, so Spark and the SQL oracle compare bit-identically.
# Kana at >=5% fires before Han so Japanese (Han+kana mix) never
# misroutes to zh; everything else needs >=30% of non-space chars.
SCRIPT_GATES = [
    ("ja", "kana", 20, 1),
    ("ko", "hangul", 10, 3),
    ("zh", "han", 10, 3),
    ("ru", "cyrillic", 10, 3),
    ("ar", "arabic", 10, 3),
    ("hi", "devanagari", 10, 3),
    ("el", "greek", 10, 3),
    ("he", "hebrew", 10, 3),
]


def token_count_expr(text: Column) -> Column:
    """Whitespace token count (empties excluded)."""
    return F.size(F.filter(F.split(text, r"\s+"), lambda x: x != F.lit("")))


# BPE-ish pre-tokenizer (GPT-2-style shape, ASCII classes so Java regex
# and RE2 agree): common contractions, letter runs, digit runs capped at
# 3 (byte-level BPEs chunk long numbers), punctuation runs, stray quotes
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\s']+|'"


def bpe_ish_token_count_expr(text: Column) -> Column:
    """Approximate LLM-token count: matches of the BPE-ish pre-tokenizer
    pattern (one JVM regexp pass; the real tokenizer's merges only split
    these pieces further, so this lower-bounds BPE token counts with the
    right shape — letters vs digits vs punctuation)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), F.lit(0)))


def _punct_ratio_raw(text: Column) -> Column:
    n = F.length(text)
    np_ = F.length(F.regexp_replace(text, r"[\w\s]", ""))
    return np_.cast("double") / F.when(n > 0, n).otherwise(F.lit(1))


def _stopword_ratio_raw(text: Column, lang: str = "en") -> Column:
    toks = _tokens(text)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    n = F.size(toks)
    return n_sw.cast("double") / F.when(n > 0, n).otherwise(F.lit(1))


def punct_ratio_expr(text: Column) -> Column:
    """Fraction of non-word, non-space characters, rounded to 6dp."""
    return F.round(_punct_ratio_raw(text), 6)


def stopword_ratio_expr(text: Column, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords for ``lang``, rounded 6dp."""
    return F.round(_stopword_ratio_raw(text, lang), 6)


def quality_score_expr(text: Column) -> Column:
    """Composite quality heuristic in [0,1]: length gate, moderate punct,
    nonzero stopword presence.

    Weights are powers of two (0.5/0.25/0.25) and no rounding is applied,
    so the result is a bit-identical double across engines (int/int
    divisions are correctly rounded, power-of-two scaling is exact, and
    the addition order is fixed) — comparisons on it are oracle-safe;
    the raw value is not hash-safe (see quality_class_expr).
    """
    n_tok = token_count_expr(text)
    len_ok = F.when(n_tok >= 10, 1.0).otherwise(n_tok.cast("double") / 10.0)
    punct = _punct_ratio_raw(text)
    punct_ok = F.when(punct <= 0.2, 1.0).otherwise(
        F.greatest(F.lit(0.0), 1.0 - (punct - 0.2) * 2)
    )
    sw = _stopword_ratio_raw(text)
    sw_ok = F.least(F.lit(1.0), sw * 5)
    return len_ok * 0.5 + punct_ok * 0.25 + sw_ok * 0.25


def quality_class_expr(text: Column) -> Column:
    """Categorical quality bucket — hash-safe across engines (double
    comparisons on bit-identical values, no rounding)."""
    q = quality_score_expr(text)
    return (
        F.when(q >= 0.8, "high").when(q >= 0.5, "medium").otherwise("low")
    )


# Gopher-style document filter defaults (Rae et al. 2021 §A1.1 shape,
# thresholds adapted to the short-doc fixture corpus).  All gates
# compare INTEGER statistics (counts or floor(frac·10⁶) ppm longs), so
# the verdicts are hash-exact across engines.
GOPHER_DEFAULTS = {
    "min_tokens": 15,
    "max_tokens": 100_000,
    "min_mean_word_len_ppm": 3_000_000,   # 3.0 chars
    "max_mean_word_len_ppm": 10_000_000,  # 10.0 chars
    "max_punct_ppm": 100_000,             # symbol ratio ≤ 0.1
    "min_stopword_hits": 2,               # ≥2 stopword occurrences
    "max_dup_word_ppm": 300_000,          # dup-word fraction ≤ 0.3
}


def gopher_flags_exprs(
    text: Column, lang: str = "en", **overrides
) -> dict:
    """Per-rule boolean verdicts of a Gopher/C4-style quality filter,
    plus the composite ``keep``.  Pure JVM expressions (one pass, no
    Python), integer/ppm gates only — see GOPHER_DEFAULTS.

    Limitation: the gates are whitespace-token heuristics calibrated
    for space-delimited scripts.  CJK text tokenizes to a few huge
    "words" and fails the mean-word-length gate regardless of quality —
    route non-Latin scripts via ``lang_id_expr`` first and gate them
    with script-appropriate thresholds (or rare_trigram_stats, which
    is script-agnostic)."""
    p = dict(GOPHER_DEFAULTS)
    unknown = set(overrides) - set(p)
    if unknown:
        raise ValueError(f"unknown gopher thresholds: {sorted(unknown)}")
    p.update(overrides)
    toks = _tokens(text)
    n = F.size(toks)
    # chars across tokens = len(join) − separators (exact, no regexp)
    chars = F.length(F.concat_ws(" ", toks)) - F.greatest(
        n - 1, F.lit(0)
    )
    mean_ppm = F.when(n > 0, _ppm(chars.cast("double") / n)).otherwise(
        F.lit(0).cast("long")
    )
    punct_ppm = _ppm(_punct_ratio_raw(text))
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    dup_ppm = dup_word_frac_expr(text, ppm=True)
    flags = {
        "ok_n_tokens": (n >= p["min_tokens"]) & (n <= p["max_tokens"]),
        "ok_mean_word_len": (mean_ppm >= p["min_mean_word_len_ppm"])
        & (mean_ppm <= p["max_mean_word_len_ppm"]),
        "ok_punct": punct_ppm <= p["max_punct_ppm"],
        "ok_stopwords": n_sw >= p["min_stopword_hits"],
        "ok_dup_words": dup_ppm <= p["max_dup_word_ppm"],
    }
    keep = None
    for c in flags.values():
        keep = c if keep is None else (keep & c)
    flags["keep"] = keep
    return flags


def _stopword_vote_masks() -> dict:
    """token → 10-bit language bitmask (bit i = sorted(STOPWORDS)[i]
    contains the token).  Stopwords OVERLAP across languages ('de' is
    es+fr, 'en' is es, ...), hence a bitmask, not a single label."""
    langs = sorted(STOPWORDS)
    masks: dict = {}
    for i, lang in enumerate(langs):
        for w in STOPWORDS[lang]:
            masks[w] = masks.get(w, 0) | (1 << i)
    return masks


def _stopword_vote_expr(text: Column) -> Column:
    """Stopword-vote language guess over the 10 Latin-script STOPWORDS
    languages: per-language hit counts, argmax with deterministic
    tie-break (language name asc); 'und' if no votes.

    ONE pass over the tokens (round-4 rewrite): each token resolves to
    a language bitmask via a single ~96-entry map-literal lookup, and
    the 10 counters accumulate in one ``aggregate`` fold — versus the
    round-3 shape of 10 independent ``filter(array_contains)`` scans
    (~100 string comparisons per token), which the driver bench showed
    at 6.4x the round-2 cost once the vote grew to 10 languages.
    Identical output by construction (same counts, same argmax)."""
    langs = sorted(STOPWORDS)
    masks = _stopword_vote_masks()
    maxlen = max(len(w) for w in masks)
    toks = _tokens(text)
    m = F.create_map(*[F.lit(x) for kv in sorted(masks.items()) for x in kv])
    # length pre-gate: tokens longer than the longest stopword skip the
    # ~96-key literal-map scan entirely (one int compare) — ~20% off the
    # fold on prose, measured at sf0.1
    lookup = lambda t: F.when(
        F.length(t) <= maxlen, F.coalesce(m[t], F.lit(0))
    ).otherwise(F.lit(0))
    counts = F.aggregate(
        F.transform(toks, lookup),
        F.array_repeat(F.lit(0), len(langs)),
        lambda acc, x: F.zip_with(
            acc,
            F.array(*[
                F.shiftright(x, i).bitwiseAND(F.lit(1))
                for i in range(len(langs))
            ]),
            lambda a, b: a + b,
        ),
    )
    best = F.aggregate(
        F.zip_with(
            counts,
            F.array(*[F.lit(lang) for lang in langs]),
            lambda n, lang: F.struct(n.alias("n"), lang.alias("lang")),
        ),
        F.struct(F.lit(-1).cast("int").alias("n"), F.lit("").alias("lang")),
        # strict > keeps the FIRST (lang-asc) maximum
        lambda acc, s: F.when(s["n"] > acc["n"], s).otherwise(acc),
    )
    return F.when(best["n"] > 0, best["lang"]).otherwise(F.lit("und"))


def lang_id_expr(text: Column) -> Column:
    """Two-stage language ID, all JVM-codegen expressions.

    Stage 1 — Unicode-script gates (SCRIPT_GATES order): if >=30% of
    non-space characters fall in a script's BMP range (>=5% for kana,
    which is definitive for Japanese), classify immediately — zh, ja,
    ko, ru, ar, hi, el, he.

    Stage 2 — stopword vote (:func:`_stopword_vote_expr`) over the 10
    Latin-script STOPWORDS languages.

    Cost shape (round-4 rewrite, same outputs): script counts use
    ``regexp_count(text, '[lo-hi]')`` — count-only, no replaced-string
    allocation like the old ``length(regexp_replace(...))`` — and the
    whole 8-gate chain hides behind ONE ``[^\\x00-\\x7F]`` pre-probe:
    CaseWhen evaluates lazily per row, and no script gate can fire on
    pure-ASCII text (every SCRIPT_RANGES block is non-ASCII), so the
    common ASCII document pays one cheap regex instead of nine.
    Measured 3.1x on the sf0.1 bench fixture; DuckDB oracle unchanged
    (counting chars in a class ≡ length after deleting its complement).
    """
    vote = _stopword_vote_expr(text)
    out = vote
    # script gates wrap the vote, highest priority outermost
    nonspace = F.length(text) - F.regexp_count(text, F.lit(r"\s"))
    for lang, script, num, den in reversed(SCRIPT_GATES):
        lo, hi = SCRIPT_RANGES[script]
        cnt = F.regexp_count(text, F.lit(f"[{lo}-{hi}]"))
        out = F.when(
            (cnt > 0) & (cnt * num >= nonspace * den), F.lit(lang)
        ).otherwise(out)
    return F.when(text.rlike("[^\\x00-\\x7F]"), out).otherwise(vote)


def _tokens(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), r"\s+"), lambda x: x != F.lit(""))


def _ppm(frac: Column) -> Column:
    # floor((num/den)·10⁶) — floor + cast is truncation-identical across
    # Spark and DuckDB (a bare double→bigint CAST truncates in Spark but
    # ROUNDS in DuckDB), and IEEE doubles make the product deterministic
    return F.floor(frac * F.lit(1000000.0)).cast("long")


def dup_word_frac_expr(text: Column, ppm: bool = False) -> Column:
    """Fraction of tokens that are repeats of an earlier token:
    ``1 − distinct/total`` (0.0 for empty docs).  The cheap
    within-document repetition signal (Gopher-style filters drop docs
    above ~0.3).  ``ppm=True`` returns floor(frac·10⁶) as a long —
    the cross-engine hash-safe form; default is a 6dp double."""
    toks = _tokens(text)
    n = F.size(toks)
    frac = F.lit(1.0) - F.size(F.array_distinct(toks)).cast("double") / \
        F.when(n > 0, n).otherwise(F.lit(1))
    frac = F.when(n > 0, frac).otherwise(F.lit(0.0))
    return _ppm(frac) if ppm else F.round(frac, 6)


def top_ngram_char_frac_expr(text: Column, n: int, ppm: bool = False) -> Column:
    """Character-coverage of the heaviest word n-gram: max over n-grams
    of ``occurrences × chars(gram)``, divided by the doc's token-joined
    char length (Gopher repetition filter, top-2/3/4-gram variants;
    taking the max of the product instead of argmax-by-count keeps the
    statistic deterministic under count ties).

    TEST-SCALE ONLY: the nested-lambda count is O(tokens²) in
    interpreted JVM higher-order functions (measured ~0.1s/doc at 50
    tokens).  The production shape is :func:`repetition_stats` —
    explode → hash-aggregate, linear and codegen'd — which computes the
    identical value; this expression form exists as its oracle and for
    ad-hoc use on short strings.
    """
    toks = _tokens(text)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    best = F.array_max(
        F.transform(
            grams,
            lambda g: F.size(F.filter(grams, lambda h: h == g)) * F.length(g),
        )
    )
    total = F.length(F.concat_ws(" ", toks))
    # sequence(1, size-(n-1)) DESCENDS when size < n — the when() guard
    # keeps that branch unevaluated (CaseWhen is lazy per row)
    frac = F.when(
        F.size(toks) >= n,
        best.cast("double") / F.when(total > 0, total).otherwise(F.lit(1)),
    ).otherwise(F.lit(0.0))
    return _ppm(frac) if ppm else F.round(frac, 6)


def repetition_stats(df, ns: tuple = (2, 3), id_col: str = "doc_id",
                     text_col: str = "text"):
    """Scalable within-document repetition metrics: one row per input
    doc with ``dup_word_ppm`` and ``top{n}gram_ppm`` per n in ``ns``
    (floor(frac·10⁶) longs — the cross-engine hash-safe encoding).

    Shape: gram construction is a linear array transform; the count
    that makes the naive form quadratic runs as explode →
    ``groupBy(id, gram)`` hash-aggregate → per-doc max — all
    whole-stage-codegen, partial-aggregated map-side, one shuffle per
    n (keyed by (id, gram), so hot grams in ONE doc cannot skew a
    whole partition).  Left joins are id-keyed and AQE-coalesced.
    Values are bit-identical to :func:`top_ngram_char_frac_expr`.
    """
    toks = _tokens(F.col(text_col))
    base = (
        df.select(id_col, toks.alias("toks"))
        .withColumn("n_tok", F.size("toks"))
        .withColumn("total", F.length(F.concat_ws(" ", F.col("toks"))))
    )
    dup = F.lit(1.0) - F.size(F.array_distinct("toks")).cast("double") / \
        F.when(F.col("n_tok") > 0, F.col("n_tok")).otherwise(F.lit(1))
    out = base.select(
        id_col, "n_tok", "total",
        _ppm(F.when(F.col("n_tok") > 0, dup).otherwise(F.lit(0.0)))
        .alias("dup_word_ppm"),
    )
    for n in ns:
        # one-arg lambda only: a second parameter makes transform() pass
        # the array INDEX there (n is safely captured — PySpark invokes
        # the lambda eagerly while building the expression)
        grams = F.transform(
            F.sequence(F.lit(1), F.col("n_tok") - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(F.col("toks"), i, n)),
        )
        best = (
            base.filter(F.col("n_tok") >= n)
            .select(id_col, F.explode(grams).alias("gram"))
            .groupBy(id_col, "gram")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy(id_col)
            .agg(F.max(F.col("c") * F.length("gram")).alias("best"))
        )
        frac = F.when(
            F.col("best").isNotNull(),
            F.col("best").cast("double") /
            F.when(F.col("total") > 0, F.col("total")).otherwise(F.lit(1)),
        ).otherwise(F.lit(0.0))
        out = (
            out.join(best, id_col, "left")
            .withColumn(f"top{n}gram_ppm", _ppm(frac))
            .drop("best")
        )
    return out.drop("n_tok", "total")


def rare_trigram_stats(df, min_count: int = 3, id_col: str = "doc_id",
                       text_col: str = "text", broadcast_vocab: bool = True):
    """CCNet-style rarity scoring without an external language model:
    per document, the fraction of its character trigrams whose CORPUS
    frequency is below ``min_count`` — high values flag gibberish,
    encoding damage, and OOV-ish text the way an LM-perplexity tail
    does, but from the corpus's own statistics (integer-exact, so the
    score is hash-safe cross-engine; a log-prob version would ride on
    libm ulps).  Output: (id, n_trigrams, n_rare, rare_ppm).

    Shape at scale: one linear trigram explode → per-(doc,tri) hash
    aggregate (map-side combined; hot trigrams in one doc collapse
    before the shuffle) → corpus counts derived FROM that aggregate
    (second small shuffle) and **broadcast** back — for space-delimited
    scripts the trigram vocabulary is small (charset³-bounded and
    Zipf-concentrated), so the per-trigram side needs no shuffle join
    at any corpus size.  For large-script corpora (CJK at web scale can
    reach 10⁸+ distinct trigrams) pass ``broadcast_vocab=False`` to use
    a plain shuffle join instead of OOMing the broadcast; AQE handles
    the residual skew."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    base = df.select(id_col, norm.alias("_nrm")).withColumn(
        "_len", F.length("_nrm")
    )
    tri = (
        base.filter(F.col("_len") >= 3)
        .select(
            id_col,
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.col("_len") - 2),
                    lambda i: F.col("_nrm").substr(i, F.lit(3)),
                )
            ).alias("_tri"),
        )
    )
    dc = tri.groupBy(id_col, "_tri").agg(F.count(F.lit(1)).alias("_c"))
    cc = dc.groupBy("_tri").agg(F.sum("_c").alias("_cc"))
    cc = F.broadcast(cc) if broadcast_vocab else cc
    agg = (
        dc.join(cc, "_tri")
        .groupBy(id_col)
        .agg(
            F.sum("_c").alias("n_trigrams"),
            F.coalesce(
                F.sum(F.when(F.col("_cc") < min_count, F.col("_c"))),
                F.lit(0),
            ).alias("n_rare"),
        )
    )
    out = base.select(id_col).join(agg, id_col, "left")
    n_tri = F.coalesce(F.col("n_trigrams"), F.lit(0))
    n_rare = F.coalesce(F.col("n_rare"), F.lit(0))
    return out.select(
        id_col,
        n_tri.alias("n_trigrams"),
        n_rare.alias("n_rare"),
        _ppm(
            n_rare.cast("double")
            / F.when(n_tri > 0, n_tri).otherwise(F.lit(1))
        ).alias("rare_ppm"),
    )


def doc_fingerprint_expr(text: Column) -> Column:
    """64-bit document fingerprint: xxhash64 of normalized text
    (lowercased, whitespace collapsed) — the cheap exact-dup key."""
    norm = F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")
    return F.xxhash64(norm)


# ---------------------------------------------------------------------------
# PII scrubbing (training-data redaction)
# ---------------------------------------------------------------------------

# Patterns restricted to the syntax both engines of the correctness
# gate share semantics for (Java regex on Spark, RE2 on DuckDB): no
# lookaround, no backrefs, ASCII classes and `\b` only.  They are the
# C4/Dolma-style cheap structural redactors, not validators — a few
# false positives are the accepted cost; false negatives (lost
# redactions) are what the shapes minimize.
PII_EMAIL_PATTERN = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_IPV4_PATTERN = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
# 2-4 separator-delimited groups after the country code: covers
# '+1-555-123-4567' and '+44 20 7946 0958' — the old fixed cc+3+4
# shape matched only a PREFIX of 4-group numbers, leaving the last
# digits unredacted ('<PHONE>-4567')
PII_PHONE_PATTERN = r"\+\d{1,3}(?:[- ]?\d{2,4}){2,4}\b"

_PII_ORDER = (
    (PII_EMAIL_PATTERN, "<EMAIL>"),
    (PII_IPV4_PATTERN, "<IP>"),
    (PII_PHONE_PATTERN, "<PHONE>"),
)


def pii_scrub_expr(text: Column) -> Column:
    """Replace emails, IPv4 addresses, then international phone numbers
    with typed placeholder tokens.  Order matters and is fixed:
    emails first (their local parts contain digit runs a later phone
    pass could shred), then IPs, then phones.  Pure JVM
    ``regexp_replace`` chain — codegen'd, no Python."""
    out = text
    for pattern, token in _PII_ORDER:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_count_exprs(text: Column) -> dict:
    """Match counts per PII class on the RAW text (before scrubbing),
    as ``{"n_emails": Column, "n_ips": Column, "n_phones": Column}`` —
    the audit-side dual of ``pii_scrub_expr`` for redaction-rate
    dashboards and filter thresholds."""
    return {
        "n_emails": F.regexp_count(text, F.lit(PII_EMAIL_PATTERN)),
        "n_ips": F.regexp_count(text, F.lit(PII_IPV4_PATTERN)),
        "n_phones": F.regexp_count(text, F.lit(PII_PHONE_PATTERN)),
    }


# ---------------------------------------------------------------------------
# C4-style line + document structural filters (Raffel et al. 2020 §2.2)
# ---------------------------------------------------------------------------

#: line-level boilerplate phrases (the C4 "cookies"/policy rule).  Kept
#: to substrings both engines match identically with plain `contains`.
C4_BOILERPLATE_PHRASES = ("cookie", "privacy policy", "terms of use")


def c4_exprs(
    text: Column, min_words: int = 5, min_sentences: int = 3
) -> dict:
    """C4 cleaning rules (Raffel et al. 2020 §2.2, the public
    "Colossal Clean Crawled Corpus" recipe) as pure per-row column
    expressions — so callers can FILTER inline (``c4_exprs(col)
    ["keep"]``) with zero shuffle and zero joins, or project the full
    stat row (``c4_line_stats``).

    Line level (a line is kept iff ALL hold):

    * ends in a terminal punctuation mark (``. ! ? "`` after trim);
    * has at least ``min_words`` whitespace words;
    * does not mention ``javascript``;
    * carries none of the boilerplate phrases (cookie / privacy
      policy / terms of use).

    Document level: ``keep`` is false when the raw text contains
    ``lorem ipsum`` or a ``{`` (code leak), or when the kept lines
    carry fewer than ``min_sentences`` sentence-terminal marks.

    Every output is an integer or boolean (hash-exact cross-engine);
    everything stays inside whole-stage codegen.
    """
    lines = F.split(text, "\n")

    def line_kept(line):
        t = F.trim(line)
        low = F.lower(t)
        bp = F.lit(False)
        for phrase in C4_BOILERPLATE_PHRASES:
            bp = bp | low.contains(phrase)
        return (
            t.rlike(r'[.!?"]$')
            & (F.size(F.split(t, r"\s+")) >= min_words)
            & ~low.contains("javascript")
            & ~bp
        )

    kept = F.filter(lines, line_kept)
    clean = F.array_join(kept, "\n")
    low_all = F.lower(text)
    has_lorem = low_all.contains("lorem ipsum")
    has_brace = text.contains("{")
    n_sentences = F.regexp_count(clean, F.lit(r"[.!?]"))
    return {
        "n_lines": F.size(lines),
        "n_kept": F.size(kept),
        "has_lorem_ipsum": has_lorem,
        "has_brace": has_brace,
        "n_sentences": n_sentences,
        "keep": ~has_lorem & ~has_brace & (n_sentences >= min_sentences),
        "clean_chars": F.length(clean),
    }


def c4_line_stats(
    df,
    min_words: int = 5,
    min_sentences: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Per-document projection of ``c4_exprs`` — the oracle-facing
    stat table ``(id, n_lines, n_kept, has_lorem_ipsum, has_brace,
    n_sentences, keep, clean_chars)``."""
    ex = c4_exprs(F.col(text_col), min_words, min_sentences)
    return df.select(id_col, *[c.alias(k) for k, c in ex.items()])


def corpus_report(
    df,
    group_cols: tuple = ("lang", "source"),
    text_col: str = "text",
    max_dup_word_ppm: int = 300_000,
    lang_col: str | None = "lang",
):
    """Per-slice corpus health report — the first query a curation run
    executes against a new crawl: document and token volumes plus the
    Gopher-composite pass rate per (lang, source) slice, everything an
    integer so the report is hash-exact cross-engine.

    The stopword gate is per-ROW-language (``lang_col``): each doc is
    tested against its own language's stopword list — an English-only
    list would fail essentially every French/German doc and make the
    per-language pass-rate comparison this report exists for
    meaningless.  Languages without a STOPWORDS entry (and rows where
    ``lang_col`` is null) skip the stopword gate rather than fail it;
    pass ``lang_col=None`` to force the single-language ``'en'`` gate.

    One pass, one map-side-combined aggregate on the (small) group
    key — no windows, no joins; at 10^12 docs the output stays
    |langs|x|sources| rows.
    """
    flags = gopher_flags_exprs(
        F.col(text_col), max_dup_word_ppm=max_dup_word_ppm
    )
    keep = flags["keep"]
    if lang_col is not None and lang_col in df.columns:
        toks = _tokens(F.col(text_col))
        hits = None
        for lg in sorted(STOPWORDS):
            sw = F.array(*[F.lit(w) for w in STOPWORDS[lg]])
            h = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
            cond = F.col(lang_col) == lg
            hits = F.when(cond, h) if hits is None else hits.when(cond, h)
        n_sw = hits.otherwise(F.lit(None))
        ok_sw = n_sw.isNull() | (
            n_sw >= GOPHER_DEFAULTS["min_stopword_hits"]
        )
        keep = (
            flags["ok_n_tokens"] & flags["ok_mean_word_len"]
            & flags["ok_punct"] & ok_sw & flags["ok_dup_words"]
        )
    return (
        df.select(
            *group_cols,
            token_count_expr(F.col(text_col)).alias("_tok"),
            F.length(text_col).alias("_chars"),
            keep.cast("long").alias("_keep"),
        )
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_tok").alias("total_tokens"),
            F.sum("_chars").alias("total_chars"),
            F.min("_tok").alias("min_tokens"),
            F.max("_tok").alias("max_tokens"),
            F.sum("_keep").alias("n_quality_pass"),
        )
    )
