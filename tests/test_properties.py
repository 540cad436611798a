"""Property-based tests (hypothesis) for the curation operators whose
contracts are algebraic: random micro-corpora, invariants checked
against independent Python recomputation. Complements the fixed-fixture
unit tests and the DuckDB oracle gate (SURVEY §5 test strategy).
"""

from __future__ import annotations

import hashlib
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from big_data_project_implementation_spark.operators import dedup, text

_word = st.text(alphabet="abcd", min_size=1, max_size=3)
_doc = st.lists(_word, min_size=0, max_size=24).map(" ".join)
_corpus = st.lists(
    st.tuples(st.integers(0, 10**6), _doc),
    min_size=1,
    max_size=10,
    unique_by=lambda t: t[0],
)

_SETTINGS = dict(max_examples=12, deadline=None,
                 suppress_health_check=[HealthCheck.too_slow])


@settings(**_SETTINGS)
@given(corpus=_corpus)
def test_duplicated_mass_bounds_and_consistency(spark, corpus):
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    rows = dedup.duplicated_mass(df, k=2).collect()
    assert len(rows) == len(corpus)  # every doc exactly one row
    for r in rows:
        assert 0 <= r.dup_tokens <= r.n_tokens
        assert r.dup_fraction == round(
            r.dup_tokens / max(r.n_tokens, 1), 6
        )
        if r.dup_fraction >= 0.8:
            assert r.action == "drop"
        elif r.dup_tokens > 0:
            assert r.action == "trim"
        else:
            assert r.action == "keep"


@settings(**_SETTINGS)
@given(corpus=_corpus)
def test_duplicated_spans_are_maximal_and_disjoint(spark, corpus):
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    k = 2
    by_doc: dict[int, list] = {}
    for r in dedup.duplicated_spans(df, k=k).collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_rows in by_doc.values():
        doc_rows.sort(key=lambda r: r.span_start)
        for prev, nxt in zip(doc_rows, doc_rows[1:]):
            # maximality: islands are separated by >= 1 missing gram
            assert nxt.span_start >= prev.span_start + prev.n_grams + 1
        for r in doc_rows:
            # contiguous island: token extent is gram count + k - 1
            assert r.span_tokens == r.n_grams + k - 1


def _expected_mixture(corpus, budgets):
    """Independent Python recomputation of token_budget_sample."""
    kept = {}
    by_src: dict[str, list] = {}
    for doc_id, src, txt in corpus:
        by_src.setdefault(src, []).append((doc_id, txt))
    for src, docs in by_src.items():
        if src not in budgets:
            continue
        docs.sort(key=lambda d: (hashlib.md5(str(d[0]).encode()).hexdigest(), d[0]))
        cum = 0
        for doc_id, txt in docs:
            n = len(re.split(r"\s+", txt)) if txt is not None else 0
            cum += n
            if cum <= budgets[src]:
                kept[doc_id] = (src, n, cum)
    return kept


@settings(**_SETTINGS)
@given(
    corpus=st.lists(
        st.tuples(
            st.integers(0, 10**6),
            st.sampled_from(["web", "code", "wiki"]),
            _doc,
        ),
        min_size=1,
        max_size=14,
        unique_by=lambda t: t[0],
    ),
    budgets=st.fixed_dictionaries(
        {"web": st.integers(0, 60), "code": st.integers(0, 60)}
    ),
)
def test_token_budget_sample_matches_python_recompute(spark, corpus, budgets):
    df = spark.createDataFrame(corpus, "doc_id long, source string, text string")
    got = {
        r.doc_id: (r.source, r.n_tokens, r.cum_tokens)
        for r in text.token_budget_sample(df, budgets).collect()
    }
    assert got == _expected_mixture(corpus, budgets)


@settings(**_SETTINGS)
@given(corpus=_corpus)
def test_repetition_signals_match_python_recompute(spark, corpus):
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    rows = {r.doc_id: r for r in text.repetition_signals(df).collect()}
    assert set(rows) == {i for i, _ in corpus}
    for doc_id, body in corpus:
        toks = body.split(" ")
        g2 = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
        g3 = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
        r = rows[doc_id]
        assert r.n2_total == len(g2) and r.n3_total == len(g3)
        if g2:
            assert r.dup_2gram_frac == round(1 - len(set(g2)) / len(g2), 6)
            top = max(g2.count(x) for x in set(g2))
            assert r.top_2gram_frac == round(top / len(g2), 6)
        else:
            assert r.dup_2gram_frac == 0.0 and r.top_2gram_frac == 0.0
        if g3:
            dup_mass = sum(c for c in (g3.count(x) for x in set(g3)) if c > 1)
            assert r.dup_3gram_frac == round(dup_mass / len(g3), 6)
        else:
            assert r.dup_3gram_frac == 0.0


@settings(**_SETTINGS)
@given(corpus=_corpus)
def test_ngram_novelty_matches_python_recompute(spark, corpus):
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    rows = {r.doc_id: r for r in text.ngram_novelty(df, n=3).collect()}
    first_seen: dict[str, int] = {}
    grams_by_doc: dict[int, list] = {}
    for doc_id, body in sorted(corpus):
        toks = body.split(" ")
        g3 = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
        grams_by_doc[doc_id] = g3
        for g in g3:
            first_seen.setdefault(g, doc_id)
    for doc_id, _ in corpus:
        g3 = grams_by_doc[doc_id]
        novel = sum(1 for g in g3 if first_seen[g] == doc_id)
        r = rows[doc_id]
        assert (r.n_grams, r.n_novel) == (len(g3), novel)
        expect = round(novel / len(g3), 6) if g3 else 0.0
        assert r.novelty_frac == expect


@settings(**_SETTINGS)
@given(corpus=_corpus)
def test_passage_dedup_matches_python_recompute(spark, corpus):
    """Exact recompute: first occurrence of each chunk (by doc, idx)
    survives, all others vanish; reassembly preserves in-doc order."""
    chunk = 3
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {r.doc_id: r for r in text.passage_dedup(df, chunk=chunk).collect()}

    seen: set[str] = set()
    expect: dict[int, list[str]] = {}
    n_chunks: dict[int, int] = {}
    for doc_id, doc in sorted(corpus):
        toks = doc.split(" ")
        chunks = [
            " ".join(toks[i : i + chunk]) for i in range(0, len(toks), chunk)
        ] if doc != "" else ([""] if False else [])
        # split(" ") of "" is [""] -> one chunk of ""
        if doc == "":
            chunks = [""]
        n_chunks[doc_id] = len(chunks)
        kept = []
        for c in chunks:
            if c not in seen:
                seen.add(c)
                kept.append(c)
        expect[doc_id] = kept
    for doc_id, _ in corpus:
        r = got[doc_id]
        assert r.n_chunks == n_chunks[doc_id], (doc_id, r, n_chunks[doc_id])
        assert r.n_kept == len(expect[doc_id])
        assert r.dedup_text == " ".join(expect[doc_id])


@settings(**_SETTINGS)
@given(corpus=_corpus)
def test_containment_pairs_match_python_recompute(spark, corpus):
    """Exact recompute of n-gram containment over the df-capped gram
    space (cap high enough here to never trigger)."""
    n = 2
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): (r.inter, r.n_grams_a)
        for r in dedup.containment_pairs(
            df, n=n, threshold=0.0, max_df=10**6
        ).collect()
    }
    grams = {
        doc_id: {
            " ".join(doc.split(" ")[i : i + n])
            for i in range(len(doc.split(" ")) - n + 1)
        }
        for doc_id, doc in corpus
        if len(doc.split(" ")) >= n
    }
    for (a, ga) in grams.items():
        for (b, gb) in grams.items():
            if a == b or not ga:
                continue
            inter = len(ga & gb)
            if inter > 0:
                assert got[(a, b)] == (inter, len(ga)), (a, b)
            else:
                assert (a, b) not in got


@settings(**_SETTINGS)
@given(corpus=_corpus, k=st.integers(1, 5))
def test_source_quota_is_md5_prefix_per_source(spark, corpus, k):
    rows = [(i, t, f"s{i % 2}") for (i, t) in corpus]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = sorted(r.doc_id for r in text.source_quota(df, max_per_source=k).collect())
    expect = []
    for src in {r[2] for r in rows}:
        ids = [i for (i, _, s) in rows if s == src]
        ordered = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        expect += ordered[:k]
    assert got == sorted(expect)


@settings(**_SETTINGS)
@given(corpus=_corpus)
def test_bloom_probe_never_false_negative(spark, corpus):
    """Hypothesis sweep of the Bloom guarantee over random micro-
    corpora: every inserted item is a member; Python recompute of the
    md5 bit positions independently predicts EXACTLY which probes hit
    (the filter is deterministic, false positives included)."""
    import hashlib

    from big_data_project_implementation_spark.operators import sketch

    n_bits, n_hashes = 512, 3  # small space → false positives likely
    items = sorted({t for _, t in corpus})
    if not items:
        return
    df = spark.createDataFrame([(t,) for t in items], "item string")
    bloom = sketch.bloom_build(df, "item", n_bits=n_bits, n_hashes=n_hashes)
    probes = items + [t + "!" for t in items]
    got = {
        r.item: r.bloom_member
        for r in sketch.bloom_probe(
            bloom,
            spark.createDataFrame([(t,) for t in probes], "item string"),
            "item",
            n_bits=n_bits,
            n_hashes=n_hashes,
        ).collect()
    }

    def positions(t):
        return {
            int(hashlib.md5(f"bf{i}:{t}".encode()).hexdigest()[:15], 16) % n_bits
            for i in range(n_hashes)
        }

    bits = set().union(*(positions(t) for t in items))
    for t in set(probes):
        assert got[t] == positions(t).issubset(bits)
    assert all(got[t] for t in items)  # the one-sided guarantee
