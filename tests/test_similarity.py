"""Pluggable similarities (functions/similarity.py): each similarity's
engine top-k must be rank- AND quantized-score-identical to a pandas
brute-force oracle computing the same law, the BM25 object form must be
identical to the engine-default inlined path, and range facets must
match a hand count (overlap + zero-fill laws included)."""

import math

import pandas as pd
import pytest

from org_rdkit_lucene_spark.functions.similarity import (
    BM25Similarity,
    BooleanSimilarity,
    ClassicSimilarity,
    LMDirichletSimilarity,
    resolve_similarity,
)
from org_rdkit_lucene_spark.functions.tokenizer import tokenize_text
from org_rdkit_lucene_spark.operators.query import range_facet_counts, search

QUERIES = [
    (1, "merg join spark", 10),
    (2, "hash tabl scan", 10),
    (3, "batch", 5),
    (4, "zzzmissing", 10),
]


@pytest.fixture(scope="module")
def corpus_stats(small_index, small_pdf):
    """Brute-force corpus model: per-doc token counts + global stats."""
    docmap = small_index.docmap.toPandas()
    src = small_pdf.merge(docmap, on=["repo", "path", "commit"])
    docs = {}
    for r in src.itertuples():
        toks = tokenize_text(r.content)
        counts: dict[str, int] = {}
        for t in toks:
            counts[t] = counts.get(t, 0) + 1
        docs[int(r.doc_id)] = (counts, len(toks))
    n = len(docs)
    total = sum(dl for _, dl in docs.values())
    df: dict[str, int] = {}
    cf: dict[str, int] = {}
    for counts, _ in docs.values():
        for t, c in counts.items():
            df[t] = df.get(t, 0) + 1
            cf[t] = cf.get(t, 0) + c
    return {"docs": docs, "n": n, "total": total, "avgdl": total / n,
            "df": df, "cf": cf}


def _brute_topk(stats, text, k, contrib_fn):
    """score(q, d) = Σ_t qtf · contrib(tf, dl, t); K2 tie-break."""
    qtoks = tokenize_text(text)
    qtf: dict[str, int] = {}
    for t in qtoks:
        qtf[t] = qtf.get(t, 0) + 1
    rows = []
    for doc_id, (counts, dl) in stats["docs"].items():
        s, matched = 0.0, 0
        for t, q in qtf.items():
            tf = counts.get(t, 0)
            if tf == 0 or t not in stats["df"]:
                continue
            matched += 1
            s += q * contrib_fn(tf, dl, t)
        if matched:
            rows.append((doc_id, int(math.floor(s * 1e4 + 0.5))))
    rows.sort(key=lambda r: (-r[1], r[0]))
    return pd.DataFrame(
        [(i + 1, d, sq) for i, (d, sq) in enumerate(rows[:k])],
        columns=["rank", "doc_id", "score_q"],
    )


def _check(engine_df, stats, contrib_fn):
    got = (
        engine_df.toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    parts = []
    for qid, text, k in QUERIES:
        o = _brute_topk(stats, text, k, contrib_fn)
        o.insert(0, "query_id", qid)
        parts.append(o)
    want = pd.concat(parts, ignore_index=True)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        got[["query_id", "rank", "doc_id", "score_q"]].astype("int64"),
        want[["query_id", "rank", "doc_id", "score_q"]].astype("int64"),
    )


def test_bm25_object_identical_to_default(small_index):
    """similarity=BM25Similarity() must equal the inlined default path
    bit-for-bit (ranks and quantized scores)."""
    a = search(small_index, QUERIES).toPandas().sort_values(["query_id", "rank"])
    b = (
        search(small_index, QUERIES, similarity=BM25Similarity())
        .toPandas()
        .sort_values(["query_id", "rank"])
    )
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )


def test_classic_similarity_identity(small_index, corpus_stats):
    st = corpus_stats
    n = float(st["n"])

    def contrib(tf, dl, t):
        idf_c = 1.0 + math.log((n + 1.0) / (st["df"][t] + 1.0))
        return idf_c * idf_c * math.sqrt(tf) / math.sqrt(dl)

    _check(search(small_index, QUERIES, similarity="classic"), st, contrib)


def test_lmdirichlet_identity_and_clamp(small_index, corpus_stats):
    st, mu = corpus_stats, 2000.0

    def contrib(tf, dl, t):
        p = st["cf"][t] / st["total"]
        raw = math.log(1.0 + tf / (mu * p)) + math.log(mu / (dl + mu))
        return max(0.0, raw)  # Lucene's per-term clamp

    _check(search(small_index, QUERIES, similarity="lmdirichlet"), st, contrib)


def test_boolean_similarity_is_coverage(small_index, corpus_stats):
    _check(
        search(small_index, QUERIES, similarity="boolean"),
        corpus_stats,
        lambda tf, dl, t: 1.0,
    )


def test_similarity_conjunctive_mode(small_index, corpus_stats):
    """Conjunctive filtering composes with any similarity."""
    st = corpus_stats
    qs = [(11, "merg join", 10)]
    got = (
        search(small_index, qs, mode="conjunctive", similarity="boolean")
        .toPandas()
    )
    words = set(tokenize_text(qs[0][1]))
    want_docs = sorted(
        d for d, (counts, _) in st["docs"].items() if words <= set(counts)
    )
    assert sorted(got["doc_id"]) == want_docs[: len(got)]
    # every conjunctive boolean hit scores exactly qtf-sum = n words
    assert set(got["score_q"]) <= {len(words) * 10**4}


def test_resolve_similarity():
    assert resolve_similarity(None) is None
    assert isinstance(resolve_similarity("classic"), ClassicSimilarity)
    sim = LMDirichletSimilarity(mu=500.0)
    assert resolve_similarity(sim) is sim
    assert isinstance(resolve_similarity("boolean"), BooleanSimilarity)
    with pytest.raises(ValueError):
        resolve_similarity("tfidf?")
    with pytest.raises(ValueError):
        LMDirichletSimilarity(mu=0.0)


def test_range_facets_overlap_and_zero_fill(small_index, corpus_stats):
    st = corpus_stats
    ranges = [("short", 0, 40), ("long", 40, 1 << 30), ("all", 0, 1 << 30)]
    qs = [(1, "merg join spark", 10), (4, "zzzmissing", 10)]
    got = (
        range_facet_counts(small_index, qs, ranges)
        .toPandas()
        .set_index(["query_id", "facet"])["n_docs"]
        .to_dict()
    )
    # all (query, range) pairs present, zero-hit query all-zero
    assert set(got) == {(q, lbl) for q, _, _ in qs for lbl, _, _ in ranges}
    assert got[(4, "short")] == got[(4, "long")] == got[(4, "all")] == 0
    # hand count for query 1 — a doc is a hit iff it matches ANY term
    words = set(tokenize_text("merg join spark"))
    hits = [
        dl for counts, dl in st["docs"].values() if words & set(counts)
    ]
    assert got[(1, "short")] == sum(1 for dl in hits if dl < 40)
    assert got[(1, "long")] == sum(1 for dl in hits if dl >= 40)
    # the overlapping "all" bucket counts every hit again (Lucene law)
    assert got[(1, "all")] == len(hits)
    assert got[(1, "all")] == got[(1, "short")] + got[(1, "long")]
