"""Oracle end-to-end: the Spark engine must produce rank-identical
top-k (doc_ids AND quantized scores) to the brute-force single-node
BM25 oracle on the reference query set (SURVEY §5)."""

import pandas as pd
import pytest

from org_rdkit_lucene_spark.oracle.bm25_oracle import BM25Oracle
from org_rdkit_lucene_spark.operators.query import (
    hit_counts,
    search,
    search_after,
    search_two_phase,
)


@pytest.fixture(scope="module")
def oracle(small_index, small_pdf):
    docmap = small_index.docmap.toPandas()
    src = small_pdf.merge(docmap, on=["repo", "path", "commit"])
    return BM25Oracle(src[["doc_id", "content"]])


@pytest.fixture(scope="module")
def src_with_ids(small_index, small_corpus):
    return small_corpus.join(small_index.docmap, ["repo", "path", "commit"])


def _check(engine_df, oracle_fn, queries):
    got = engine_df.toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    parts = []
    for qid, text, k in queries:
        o = oracle_fn(text, k)
        o.insert(0, "query_id", qid)
        parts.append(o)
    want = pd.concat(parts, ignore_index=True) if parts else pd.DataFrame()
    want = want.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert len(got) == len(want), (len(got), len(want))
    pd.testing.assert_frame_equal(
        got[["query_id", "rank", "doc_id", "score_q"]].astype("int64"),
        want[["query_id", "rank", "doc_id", "score_q"]].astype("int64"),
    )


def test_disjunctive_rank_identity(small_index, oracle, queries_pdf):
    qs = [
        (int(r.query_id), r.text, int(r.k))
        for r in queries_pdf[queries_pdf.query_type == "disjunctive"].itertuples()
    ]
    _check(search(small_index, qs, "disjunctive"), lambda t, k: oracle.search(t, k, "disjunctive"), qs)


def test_adaptive_two_stage_rank_branches_identical(small_index, queries_pdf, monkeypatch):
    """The adaptive rank must produce IDENTICAL results whether the
    partition-local top-k stage runs (forced via a zero threshold) or
    is skipped (small candidate bound), and the skipped plan must not
    contain the extra Python stage (exactly one MapInPandas: the block
    decode)."""
    from org_rdkit_lucene_spark.operators import query as qmod

    qs = [
        (int(r.query_id), r.text, int(r.k))
        for r in queries_pdf[queries_pdf.query_type == "disjunctive"].itertuples()
    ]
    skipped_df = search(small_index, qs, "disjunctive")
    plan_skipped = skipped_df._jdf.queryExecution().executedPlan().toString()
    assert plan_skipped.count("MapInPandas") == 1  # decode only
    skipped = skipped_df.toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)

    monkeypatch.setattr(qmod, "_use_local_topk", lambda est, n_parts, max_k: True)
    forced_df = search(small_index, qs, "disjunctive")
    plan_forced = forced_df._jdf.queryExecution().executedPlan().toString()
    assert plan_forced.count("MapInPandas") == 2  # decode + local top-k
    forced = forced_df.toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(skipped, forced)


def test_conjunctive_rank_identity(small_index, oracle, queries_pdf):
    qs = [
        (int(r.query_id), r.text, int(r.k))
        for r in queries_pdf[queries_pdf.query_type == "conjunctive"].itertuples()
    ]
    _check(search(small_index, qs, "conjunctive"), lambda t, k: oracle.search(t, k, "conjunctive"), qs)


def test_two_phase_rank_identity(small_index, oracle, queries_pdf, src_with_ids):
    qs = [
        (int(r.query_id), r.text, int(r.k))
        for r in queries_pdf[queries_pdf.query_type == "phrase_verify"].itertuples()
    ]
    _check(
        search_two_phase(small_index, src_with_ids, qs),
        lambda t, k: oracle.search_two_phase(t, k),
        qs,
    )


def test_zero_hit_query(small_index):
    out = search(small_index, [(999, "zzzunseenterm999", 10)]).toPandas()
    assert len(out) == 0


def test_hit_counts(small_index, oracle, queries_pdf):
    qs = [
        (int(r.query_id), r.text, int(r.k))
        for r in queries_pdf[queries_pdf.query_type == "disjunctive"].head(8).itertuples()
    ]
    got = hit_counts(small_index, qs).toPandas().set_index("query_id")["total_hits"]
    for qid, text, _ in qs:
        want = oracle.total_hits(text)
        if want == 0:
            assert qid not in got.index
        else:
            assert got.loc[qid] == want, text


def test_search_after_pagination(small_index, oracle, queries_pdf):
    """K5 keyset pagination: page 2 must continue exactly after page 1."""
    r = queries_pdf[queries_pdf.query_type == "disjunctive"].iloc[2]
    qid, text = int(r.query_id), r.text
    full = oracle.search(text, 20)
    page1 = search(small_index, [(qid, text, 10)]).toPandas().sort_values("rank")
    assert len(page1) >= 10
    last = page1.iloc[9]
    page2 = (
        search_after(small_index, [(qid, text, 10)], {qid: (int(last.score_q), int(last.doc_id))})
        .toPandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    want2 = full.iloc[10:20].reset_index(drop=True)
    assert list(page2["doc_id"]) == list(want2["doc_id"])
    assert list(page2["score_q"]) == list(want2["score_q"])


def test_hits_to_keys_projection(small_index):
    """P5 (getPrimaryKeysForSearchHits, ChemicalIndex.java:739-760):
    every hit maps to exactly one stored primary key, ranks preserved."""
    from org_rdkit_lucene_spark.operators.query import hits_to_keys, search

    res = search(small_index, [(1, "merg scorer", 5)])
    keys = hits_to_keys(small_index, res).toPandas().sort_values("rank")
    assert len(keys) == 5
    assert keys["rank"].tolist() == [1, 2, 3, 4, 5]
    assert keys[["repo", "path", "commit"]].notna().all().all()
    # round-trip: the key identifies the same doc_id in docmeta
    dm = small_index.docmeta.toPandas().set_index(["repo", "path", "commit"])["doc_id"]
    for r in keys.itertuples():
        assert dm.loc[(r.repo, r.path, r.commit)] == r.doc_id


def test_explain_contributions_sum_to_score(small_index, queries_pdf):
    """q9: per-term contrib_q rows exist for every hit and sum back to
    the hit's score_q within per-term quantization error (each of the
    ≤ n_terms contributions rounds independently at 1e-4)."""
    from org_rdkit_lucene_spark.operators.query import explain_scores

    qs = [
        (int(r.query_id), r.text, int(r.k))
        for r in queries_pdf[queries_pdf.query_type == "disjunctive"].itertuples()
    ]
    hits = search(small_index, qs).toPandas()
    expl = explain_scores(small_index, qs).toPandas()
    assert len(expl) >= len(hits)  # >=1 term row per hit
    sums = (
        expl.groupby(["query_id", "doc_id"])
        .agg(s=("contrib_q", "sum"), n=("term", "count"), rank=("rank", "first"))
        .reset_index()
    )
    m = hits.merge(sums, on=["query_id", "doc_id"])
    assert len(m) == len(hits)  # every hit explained
    assert (m["rank_x"] == m["rank_y"]).all()
    # independent rounding: |sum(round(c_i)) - round(sum(c_i))| <= n/2 + 1
    assert ((m["s"] - m["score_q"]).abs() <= m["n"] // 2 + 1).all()


def test_search_sorted_by_doc_len(small_index, queries_pdf):
    """Sort/SortField law: same candidate set as search(), ranked by
    doc_len DESC then doc_id ASC."""
    from org_rdkit_lucene_spark.operators.query import search_sorted

    qs = [
        (int(r.query_id), r.text, int(r.k))
        for r in queries_pdf[queries_pdf.query_type == "disjunctive"].itertuples()
    ]
    got = search_sorted(small_index, qs).toPandas()
    meta = small_index.docmeta.select("doc_id", "doc_len").toPandas()
    full = hit_counts(small_index, qs).toPandas().set_index("query_id")["total_hits"]
    for qid, _, k in qs:
        g = got[got.query_id == qid].sort_values("rank")
        expect_n = min(k, int(full.get(qid, 0)))
        assert len(g) == expect_n
        # sort_key equals the docmeta doc_len and obeys the K2-style law
        mm = g.merge(meta, on="doc_id")
        assert (mm["sort_key"] == mm["doc_len"]).all()
        keys = list(zip(-g["sort_key"], g["doc_id"]))
        assert keys == sorted(keys)


def test_multi_field_single_field_reduction(small_index, queries_pdf):
    """search_multi_field([(idx, 1.0)]) must equal plain disjunctive
    search — the boost-sum law degenerates to single-field BM25."""
    from org_rdkit_lucene_spark.operators.query import search, search_multi_field

    qs = [(int(r.query_id), r.text, int(r.k)) for r in queries_pdf.itertuples()][:6]
    a = search(small_index, qs, "disjunctive").toPandas()
    b = search_multi_field([(small_index, 1.0)], qs).toPandas()
    a = a.sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = b.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert a.equals(b)


def test_multi_field_boost_law(spark, small_index, tmp_path):
    """A second field (constant marker body per doc half) with a large
    boost must dominate ranking: docs whose field-2 body matches the
    query outrank all text-only matches."""
    from org_rdkit_lucene_spark.config import IndexConfig
    from org_rdkit_lucene_spark.operators.build import build_index
    from org_rdkit_lucene_spark.operators.query import search_multi_field

    import pandas as pd

    corpus = small_index.docmeta.select("doc_id", "repo", "path", "commit", "lang")
    pdf = corpus.toPandas()
    pdf["content"] = ["alpha" if i % 2 else "beta" for i in pdf["doc_id"]]
    pdf = pdf.rename(columns={"doc_id": "ext_id"})
    f2 = build_index(
        spark,
        spark.createDataFrame(pdf),
        IndexConfig(build_partitions=2),
        str(tmp_path / "f2"),
        id_col="ext_id",
    )
    qs = [(1, "merg alpha", 8)]
    out = search_multi_field([(small_index, 1.0), (f2, 10.0)], qs).toPandas()
    assert len(out) == 8
    # every returned doc matched 'alpha' in field 2 (odd doc ids) —
    # the boosted field dominates any text-only score
    assert (out["doc_id"] % 2 == 1).all()
