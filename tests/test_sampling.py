"""Sampling / data-selection operators (operators/sampling.py).

Oracle strategy (SURVEY §5): every operator is re-derived in plain
Python over the collected fixture and compared exactly — the operators
are deterministic by construction (md5-ordered), so equality is exact,
not statistical.  The DuckDB cross-engine check lives in the driver
contract (tools/check_contract.py: stratified_sample / hash_sample /
domain_cap / token_budget_select).
"""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from bloom_filters_spark.operators.sampling import (
    hash_threshold_sample,
    per_stratum_cap,
    stratified_sample,
    token_budget_select,
)


def _h(key) -> str:
    return hashlib.md5(str(key).encode()).hexdigest()


@pytest.fixture(scope="module")
def docs(spark):
    # 400 rows, 4 skewed strata (sizes 40/80/120/160), deterministic
    # token counts 0..49 (including zeros to hit cum-ties)
    rows = []
    i = 0
    for s, n in (("a", 40), ("b", 80), ("c", 120), ("d", 160)):
        for _ in range(n):
            rows.append((i, s, (i * 7 + 3) % 50))
            i += 1
    return spark.createDataFrame(
        rows, "doc_id long, lang string, n_tokens long"
    ).repartition(7)


def test_hash_threshold_rate_and_nesting(docs):
    base = {r.doc_id for r in docs.collect()}
    kept25 = {r.doc_id for r in hash_threshold_sample(docs, 0.25).collect()}
    kept50 = {r.doc_id for r in hash_threshold_sample(docs, 0.50).collect()}
    # exact replica of the cut in Python
    cut25 = format(int(0.25 * (1 << 32)), "08x")
    assert kept25 == {d for d in base if _h(d)[:8] < cut25}
    # monotone nesting: raising the fraction only ADDS rows (stable
    # sample growth — the property that makes the cut usable for
    # progressive data ablations)
    assert kept25 <= kept50
    assert hash_threshold_sample(docs, 1.0).count() == len(base)
    assert hash_threshold_sample(docs, 0.0).count() == 0
    with pytest.raises(ValueError):
        hash_threshold_sample(docs, 1.5)


def test_stratified_fraction_exact_counts(docs):
    out = stratified_sample(docs, "lang", fraction=0.3)
    got = {
        r.lang: r.n
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert got == {
        "a": math.ceil(0.3 * 40),
        "b": math.ceil(0.3 * 80),
        "c": math.ceil(0.3 * 120),
        "d": math.ceil(0.3 * 160),
    }
    # within each stratum, exactly the quota-smallest md5(doc_id)
    by_lang = {}
    for r in docs.collect():
        by_lang.setdefault(r.lang, []).append(r.doc_id)
    expect = set()
    for lang, ids in by_lang.items():
        k = math.ceil(0.3 * len(ids))
        expect |= set(sorted(ids, key=lambda d: (_h(d), d))[:k])
    assert {r.doc_id for r in out.collect()} == expect


def test_stratified_temperature_quotas(docs):
    budget = 200
    out = stratified_sample(docs, "lang", budget=budget, alpha=0.5)
    got = {
        r.lang: r.n
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    sizes = {"a": 40, "b": 80, "c": 120, "d": 160}
    wts = {s: math.floor(math.sqrt(n) * (1 << 20)) for s, n in sizes.items()}
    wtot = sum(wts.values())
    expect = {
        s: min(n, math.ceil(float(budget) * float(wts[s]) / float(wtot)))
        for s, n in sizes.items()
    }
    assert got == expect
    # alpha=0.5 flattens: small stratum keeps a larger share than big
    assert got["a"] / 40 > got["d"] / 160
    # alpha=1 is proportional allocation of the budget
    prop = stratified_sample(docs, "lang", budget=budget, alpha=1.0)
    gp = {
        r.lang: r.n
        for r in prop.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for s, n in sizes.items():
        assert gp[s] == min(
            n, math.ceil(float(budget) * float(n * (1 << 20)) / float(400 * (1 << 20)))
        )
    with pytest.raises(ValueError):
        stratified_sample(docs, "lang")
    with pytest.raises(ValueError):
        stratified_sample(docs, "lang", fraction=0.1, budget=10)


def test_per_stratum_cap(docs):
    out = per_stratum_cap(docs, "lang", 5)
    counts = {
        r.lang: r.n
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"a": 5, "b": 5, "c": 5, "d": 5}
    by_lang = {}
    for r in docs.collect():
        by_lang.setdefault(r.lang, []).append(r.doc_id)
    expect = set()
    for ids in by_lang.values():
        expect |= set(sorted(ids, key=lambda d: (_h(d), d))[:5])
    assert {r.doc_id for r in out.collect()} == expect
    assert per_stratum_cap(docs, "lang", 0).count() == 0


def _prefix_oracle(rows, budget):
    """The single-global-cumsum definition the two-phase plan must
    match: order by (score DESC, md5(key), key), keep while cum<=B."""
    ordered = sorted(rows, key=lambda r: (-r[1], _h(r[0]), r[0]))
    out, cum = set(), 0
    for doc_id, _score, tok in ordered:
        cum += tok
        if cum <= budget:
            out.add(doc_id)
    return out


@pytest.fixture(scope="module")
def scored(spark):
    # coarse score buckets 0..9, tokens 0..29 (zeros included)
    rows = [(i, (i * 13 + 5) % 10, (i * 11 + 2) % 30) for i in range(300)]
    df = spark.createDataFrame(
        rows, "doc_id long, score long, n_tokens long"
    ).repartition(5)
    return df, rows


@pytest.mark.parametrize("budget", [0, 1, 500, 1437, 10**9])
def test_token_budget_matches_global_prefix(scored, budget):
    df, rows = scored
    out = token_budget_select(df, "score", "n_tokens", budget=budget)
    assert {r.doc_id for r in out.collect()} == _prefix_oracle(rows, budget)


def test_token_budget_frac_and_guard(scored):
    df, rows = scored
    total = sum(r[2] for r in rows)
    out = token_budget_select(df, "score", "n_tokens", budget_frac=0.5)
    assert {r.doc_id for r in out.collect()} == _prefix_oracle(
        rows, int(0.5 * total)
    )
    with pytest.raises(ValueError, match="max_buckets"):
        token_budget_select(
            df, "doc_id", "n_tokens", budget=10, max_buckets=100
        )
    with pytest.raises(ValueError):
        token_budget_select(df, "score", "n_tokens")
    with pytest.raises(ValueError):
        token_budget_select(
            df, "score", "n_tokens", budget=1, budget_frac=0.5
        )


def test_salt_decorrelates_composed_stages(docs):
    """An unsalted sample after an unsalted cap is biased (the cap keeps
    the smallest hashes, which then all pass the cut); distinct salts
    restore independence.  Both selections are exactly replicated in
    Python — the assertion of bias is deterministic, not statistical."""
    capped = per_stratum_cap(docs, "lang", 20)
    base = {r.doc_id for r in capped.collect()}
    cut = format(int(0.5 * (1 << 32)), "08x")

    unsalted = {r.doc_id for r in hash_threshold_sample(capped, 0.5).collect()}
    assert unsalted == {d for d in base if _h(d)[:8] < cut}

    salted = {
        r.doc_id
        for r in hash_threshold_sample(capped, 0.5, salt="s2").collect()
    }
    expect = {
        d
        for d in base
        if hashlib.md5((str(d) + "s2").encode()).hexdigest()[:8] < cut
    }
    assert salted == expect
    # the bias: unsalted keeps (nearly) all cap survivors, salted ~half
    assert len(unsalted) / len(base) > 0.85
    assert 0.3 < len(salted) / len(base) < 0.7
    assert len(unsalted) > len(salted)


def test_hash_split_exact_and_stable(docs):
    from bloom_filters_spark.operators.sampling import hash_split

    out = hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    got = {r.doc_id: r.split for r in out.collect()}
    c1 = format(int(0.8 * (1 << 32)), "08x")
    c2 = format(min(int((0.8 + 0.1) * (1 << 32)), (1 << 32) - 1), "08x")
    for d in got:
        h8 = _h(d)[:8]
        want = "train" if h8 < c1 else ("val" if h8 < c2 else "test")
        assert got[d] == want
    assert set(got.values()) == {"train", "val", "test"}
    # re-weighting LATER splits never moves a train row (first label
    # owns the lowest hash range): eval-set stability under re-splits
    re_out = hash_split(docs, {"train": 0.8, "val": 0.15, "test": 0.05})
    re_got = {r.doc_id: r.split for r in re_out.collect()}
    assert {d for d, s in got.items() if s == "train"} == {
        d for d, s in re_got.items() if s == "train"
    }
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(docs, {"train": 0.5, "val": 0.1})
    with pytest.raises(ValueError):
        hash_split(docs, {})
    # single label degenerates to a constant column
    assert {
        r.split for r in hash_split(docs, {"all": 1.0}).collect()
    } == {"all"}


@pytest.mark.parametrize("margin", [1.3, 0.5])
def test_presample_margin_is_exact(docs, margin):
    """The presample prefilter must never change the result — margin
    0.5 deliberately undershoots so ~every stratum takes the shortfall
    fallback path; 1.3 exercises the fast path."""
    plain = stratified_sample(docs, "lang", fraction=0.3)
    fast = stratified_sample(
        docs, "lang", fraction=0.3, presample_margin=margin
    )
    assert {r.doc_id for r in fast.collect()} == {
        r.doc_id for r in plain.collect()
    }
    plain_b = stratified_sample(docs, "lang", budget=120, alpha=0.5)
    fast_b = stratified_sample(
        docs, "lang", budget=120, alpha=0.5, presample_margin=margin
    )
    assert {r.doc_id for r in fast_b.collect()} == {
        r.doc_id for r in plain_b.collect()
    }
    with pytest.raises(ValueError, match="presample_margin"):
        stratified_sample(
            docs, "lang", fraction=0.3, presample_margin=0
        )


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 10**6),            # doc_id (deduped below)
            st.integers(0, 5),                # coarse score bucket
            st.integers(0, 40),               # token count (zeros incl.)
        ),
        min_size=1, max_size=60,
    ),
    budget=st.integers(0, 1200),
)
def test_token_budget_property(spark, rows, budget):
    """Two-phase plan ≡ global prefix cumsum for arbitrary bucketed
    inputs and budgets (hypothesis-driven)."""
    uniq = {r[0]: r for r in rows}
    rows = list(uniq.values())
    df = spark.createDataFrame(
        rows, "doc_id long, score long, n_tokens long"
    ).repartition(3)
    out = token_budget_select(df, "score", "n_tokens", budget=budget)
    assert {r.doc_id for r in out.collect()} == _prefix_oracle(rows, budget)


def test_null_strata_and_null_scores(spark):
    """NULL strata are legitimate strata (null-safe joins — a plain
    equality join would silently drop them); NULL scores form the last
    budget bucket and NULL tokens count as 0."""
    rows = [(i, None if i % 3 == 0 else "x") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_sample(df, "lang", fraction=0.5)
    got = {}
    for r in out.collect():
        got[r.lang] = got.get(r.lang, 0) + 1
    assert got == {None: 5, "x": 10}  # ceil(.5*10), ceil(.5*20)
    fast = stratified_sample(df, "lang", fraction=0.5, presample_margin=0.4)
    assert sorted((r.doc_id, r.lang) for r in fast.collect()) == sorted(
        (r.doc_id, r.lang) for r in out.collect()
    )

    srows = [
        (1, 5, 10), (2, 5, 10),          # top bucket: 20 tokens
        (3, None, 10), (4, None, None),  # null bucket: 10 tokens
    ]
    sdf = spark.createDataFrame(srows, "doc_id long, score long, n_tokens long")
    # budget hits inside the NULL bucket: boundary must be the null
    # bucket (not misread as "everything fits")
    out = token_budget_select(sdf, "score", "n_tokens", budget=25)
    kept = {r.doc_id for r in out.collect()}
    assert {1, 2} <= kept and len(kept) == 3  # 5 remaining: one of 3/4
    # null tokens count as zero: with budget 20, the full real bucket
    # fits and doc 4 (0 tokens) can enter the null boundary bucket
    out20 = {r.doc_id for r in
             token_budget_select(sdf, "score", "n_tokens", budget=20).collect()}
    assert {1, 2} <= out20 and 3 not in out20
    # whole corpus fits (30 total incl. null-as-zero)
    assert len(token_budget_select(sdf, "score", "n_tokens", budget=30)
               .collect()) == 4
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        from bloom_filters_spark.operators.sampling import hash_split
        hash_split(sdf, {"a": -0.2, "b": 0.5, "c": 0.7})


@pytest.mark.parametrize("margin", [1.5, 0.1])
def test_per_stratum_cap_presample_exact(spark, margin):
    """Hot-domain fixture (one stratum 100x the median): the presample
    precut must return EXACTLY the plain path's rows — margin 0.1
    deliberately undershoots so the shortfall fallback engages; 1.5
    exercises the fast path."""
    rows = [(i, "hot") for i in range(4000)]
    rows += [(10_000 + i, f"d{i % 8}") for i in range(320)]
    df = spark.createDataFrame(rows, "doc_id long, host string").repartition(7)
    plain = per_stratum_cap(df, "host", 10, salt="cap")
    fast = per_stratum_cap(
        df, "host", 10, salt="cap", presample_margin=margin
    )
    assert sorted(r.doc_id for r in fast.collect()) == sorted(
        r.doc_id for r in plain.collect()
    )
    if margin == 1.5:
        # evidence the precut ENGAGES on the hot stratum: replicate the
        # cut in Python — the prefilter passes ~k*margin of 4000 rows,
        # orders of magnitude below the stratum size, and holds >= k
        # rows so no shortfall re-rank was needed
        cut = math.ceil(10 / 4000 * margin * (1 << 32))
        pre = [
            i for i in range(4000)
            if int(hashlib.md5((str(i) + "cap").encode()).hexdigest()[:8], 16)
            < cut
        ]
        assert 10 <= len(pre) < 400


def test_per_stratum_cap_presample_guards(docs):
    with pytest.raises(ValueError, match="presample_margin"):
        per_stratum_cap(docs, "lang", 5, presample_margin=0)
    with pytest.raises(ValueError, match="max_strata"):
        per_stratum_cap(docs, "doc_id", 1, presample_margin=1.3,
                        max_strata=10)


def test_per_stratum_cap_presample_null_stratum(spark):
    """NULL strata survive the precut's null-safe join, identical to
    the plain path."""
    rows = [(i, None if i % 3 == 0 else "x") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    plain = per_stratum_cap(df, "lang", 4)
    fast = per_stratum_cap(df, "lang", 4, presample_margin=1.3)
    assert sorted((r.doc_id, r.lang) for r in fast.collect()) == sorted(
        (r.doc_id, r.lang) for r in plain.collect()
    )


def test_token_budget_subbucket_boundary(spark):
    """The boundary bucket resolves through md5-prefix sub-buckets (no
    global unpartitioned window).  A single-score corpus makes the WHOLE
    corpus the boundary bucket — the worst case for the old plan — and
    the result must still equal the global prefix oracle."""
    rows = [(i, 1, (i * 17 + 3) % 40) for i in range(2000)]
    df = spark.createDataFrame(
        rows, "doc_id long, score long, n_tokens long"
    ).repartition(13)
    budget = 9000
    out = token_budget_select(df, "score", "n_tokens", budget=budget)
    assert {r.doc_id for r in out.collect()} == _prefix_oracle(rows, budget)


def test_auto_presample_small_strata_identical(docs):
    """Default "auto" on small strata declines the precut and returns
    the IDENTICAL rows as both the forced-plain and forced-precut
    paths, for both operators."""
    plain = sorted(
        r["doc_id"]
        for r in stratified_sample(
            docs, "lang", fraction=0.3, presample_margin=None
        ).collect()
    )
    auto = sorted(
        r["doc_id"]
        for r in stratified_sample(docs, "lang", fraction=0.3).collect()
    )
    forced = sorted(
        r["doc_id"]
        for r in stratified_sample(
            docs, "lang", fraction=0.3, presample_margin=1.3
        ).collect()
    )
    assert auto == plain == forced
    cap_plain = sorted(
        r["doc_id"]
        for r in per_stratum_cap(
            docs, "lang", 15, presample_margin=None
        ).collect()
    )
    cap_auto = sorted(
        r["doc_id"] for r in per_stratum_cap(docs, "lang", 15).collect()
    )
    assert cap_auto == cap_plain


def test_auto_presample_engages_on_hot_stratum(docs, monkeypatch):
    """With the threshold lowered to the fixture scale, auto must take
    the precut path (the plan filters on the hash prefix before the
    rank window — no full-stratum sort) and still return exactly the
    plain path's rows."""
    import bloom_filters_spark.operators.sampling as sampling

    monkeypatch.setattr(sampling, "PRESAMPLE_AUTO_THRESHOLD", 100)
    plain = sorted(
        r["doc_id"]
        for r in stratified_sample(
            docs, "lang", fraction=0.3, presample_margin=None
        ).collect()
    )
    # the optimizer collapses the _hv alias into the join condition:
    # `conv(substring(_h, 1, 8), ...) < _cut` BEFORE the Sort+Window —
    # the no-full-stratum-sort plan shape
    auto_df = stratified_sample(docs, "lang", fraction=0.3)
    plan = auto_df._jdf.queryExecution().executedPlan().toString()
    assert "conv(substring(" in plan and "_cut" in plan
    assert sorted(r["doc_id"] for r in auto_df.collect()) == plain

    cap_plain = sorted(
        r["doc_id"]
        for r in per_stratum_cap(
            docs, "lang", 15, presample_margin=None
        ).collect()
    )
    cap_df = per_stratum_cap(docs, "lang", 15)
    cplan = cap_df._jdf.queryExecution().executedPlan().toString()
    assert "conv(substring(" in cplan and "_cut" in cplan
    assert sorted(r["doc_id"] for r in cap_df.collect()) == cap_plain

    # too many strata for the driver histogram → auto declines (plain
    # path, no raise), unlike an explicit margin which raises
    monkeypatch.setattr(sampling, "PRESAMPLE_AUTO_THRESHOLD", 1)
    out = stratified_sample(
        docs, "lang", fraction=0.5, max_strata=2
    )
    assert "_cut" not in out._jdf.queryExecution().executedPlan().toString()
    with pytest.raises(ValueError, match="max_strata"):
        stratified_sample(
            docs, "lang", fraction=0.5, presample_margin=1.3, max_strata=2
        ).collect()
