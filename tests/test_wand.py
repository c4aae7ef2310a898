"""Block-max WAND kernel must be result-identical to the DataFrame
path (and hence to the oracle) on the full query set, for both modes
and several shard counts."""

import pandas as pd
import pytest

from org_rdkit_lucene_spark.operators.query import search
from org_rdkit_lucene_spark.operators.wand import search_wand


def _pdf(df):
    return (
        df.toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
        .astype({"query_id": "int64", "rank": "int64", "doc_id": "int64", "score_q": "int64"})
    )


@pytest.mark.parametrize("mode", ["disjunctive", "conjunctive"])
@pytest.mark.parametrize("n_shards", [1, 4, 16])
def test_wand_matches_dataframe_path(small_index, queries_pdf, mode, n_shards):
    qtype = "disjunctive" if mode == "disjunctive" else "conjunctive"
    qs = [
        (int(r.query_id), r.text, int(r.k))
        for r in queries_pdf[queries_pdf.query_type == qtype].itertuples()
    ]
    want = _pdf(search(small_index, qs, mode))
    got = _pdf(search_wand(small_index, qs, mode, n_shards=n_shards))
    pd.testing.assert_frame_equal(got, want)


def test_wand_zero_hit(small_index):
    assert search_wand(small_index, [(1, "zzzmissing", 5)]).count() == 0


def test_wand_bad_mode(small_index):
    with pytest.raises(ValueError):
        search_wand(small_index, [(1, "merg", 5)], mode="fuzzy")


@pytest.mark.parametrize("k", [50, 200, 50_000, 1_000_000])
def test_wand_large_k_identity(small_index, k):
    """Reference-scale k (LuceneBenchmark.java:358-364 benches at
    k=10^6 for MOL/FP and 5*10^4 for SS): the amortized shard-local
    truncation and the global merge must stay exact when k exceeds
    (k=5*10^4, 10^6) or truncates (k=50/200) the candidate set,
    including θ-pruning edge cases on a common term."""
    qs = [(1, "merg data main scorer token", k), (2, "get index hash", k)]
    want = _pdf(search(small_index, qs, "disjunctive"))
    got = _pdf(search_wand(small_index, qs, "disjunctive", n_shards=7))
    pd.testing.assert_frame_equal(got, want)


def test_search_auto_routes_and_is_identical(small_index, spark):
    """The cost-based router must return results identical to BOTH
    physical paths (they are identity-tested against each other), and
    must actually pick the kernel above the threshold and the
    DataFrame path below it."""
    import org_rdkit_lucene_spark.operators.query as qmod
    from org_rdkit_lucene_spark.operators.query import search, search_auto

    qs = [(1, "merg scorer token", 10), (2, "hash join", 5)]
    base = search(small_index, qs).toPandas().sort_values(["query_id", "rank"])
    auto = search_auto(small_index, qs).toPandas().sort_values(["query_id", "rank"])
    assert base.reset_index(drop=True).equals(auto.reset_index(drop=True))

    routed = {}
    orig_search, orig_wand = qmod.search, search_wand

    def spy_search(*a, **k):
        routed["path"] = "df"
        return orig_search(*a, **k)

    def spy_wand(*a, **k):
        routed["path"] = "wand"
        return orig_wand(*a, **k)

    import org_rdkit_lucene_spark.operators.wand as wmod

    qmod.search, wmod.search_wand = spy_search, spy_wand
    try:
        old = qmod.WAND_ROUTE_MIN_CANDIDATES
        qmod.WAND_ROUTE_MIN_CANDIDATES = 1  # everything is "hot"
        search_auto(small_index, qs)
        assert routed["path"] == "wand"
        qmod.WAND_ROUTE_MIN_CANDIDATES = 10**12  # nothing is
        search_auto(small_index, qs)
        assert routed["path"] == "df"
    finally:
        qmod.WAND_ROUTE_MIN_CANDIDATES = old
        qmod.search, wmod.search_wand = orig_search, orig_wand


def test_wand_search_after_identity(small_index, queries_pdf):
    """searchAfter through the WAND kernel: the cursor filters BEFORE
    heap insertion, so page 2 continues exactly after page 1 and
    equals the DataFrame-path pagination (K5 over K7)."""
    from org_rdkit_lucene_spark.operators.query import search

    r = queries_pdf[queries_pdf.query_type == "disjunctive"].iloc[2]
    qid, text = int(r.query_id), r.text
    full = (
        search(small_index, [(qid, text, 20)])
        .toPandas().sort_values("rank").reset_index(drop=True)
    )
    assert len(full) >= 12
    last = full.iloc[9]
    page2 = (
        search_wand(
            small_index, [(qid, text, 10)],
            after={qid: (int(last.score_q), int(last.doc_id))},
        )
        .toPandas().sort_values("rank").reset_index(drop=True)
    )
    want2 = full.iloc[10:20].reset_index(drop=True)
    assert list(page2.doc_id) == list(want2.doc_id)
    assert list(page2.score_q) == list(want2.score_q)
