"""Percolator (streaming/percolate.py): reverse search must be
IDENTICAL to the forward search on the same corpus — percolating the
index's own corpus yields exactly the (query, doc, score_q) set the
conjunctive/disjunctive search produces (tokenizer parity + frozen
index stats make the two directions the same law) — and the streaming
wrapper must equal the batch operator."""

import pandas as pd
import pytest

from org_rdkit_lucene_spark.operators.query import search
from org_rdkit_lucene_spark.streaming.percolate import (
    MAX_QUERIES,
    percolate,
    percolate_stream,
)

QUERIES = [
    (1, "merg join spark", 10),
    (2, "hash tabl", 10),
    (3, "zzzmissing merg", 10),  # unseen term: conjunctive can't match
]


def _forward(small_index, mode, n_docs=10_000):
    big = [(qid, text, n_docs) for qid, text, _ in QUERIES]
    return (
        search(small_index, big, mode=mode)
        .toPandas()[["query_id", "doc_id", "score_q"]]
        .sort_values(["query_id", "doc_id"])
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def corpus_with_ids(small_index, small_pdf):
    """The index's own corpus keyed by ITS doc ids (via docmap), so
    reverse and forward results are directly comparable."""
    docmap = small_index.docmap.toPandas()
    src = small_pdf.merge(docmap, on=["repo", "path", "commit"])
    return small_index.spark.createDataFrame(
        src[["doc_id", "content"]]
    )


def test_percolate_equals_conjunctive_search(small_index, corpus_with_ids):
    got = (
        percolate(small_index, corpus_with_ids, QUERIES, mode="conjunctive")
        .toPandas()
        .sort_values(["query_id", "doc_id"])
        .reset_index(drop=True)
    )
    want = _forward(small_index, "conjunctive")
    pd.testing.assert_frame_equal(
        got[["query_id", "doc_id", "score_q"]].astype("int64"),
        want.astype("int64"),
    )
    # the unseen-term query can never match conjunctively
    assert (got.query_id == 3).sum() == 0


def test_percolate_equals_disjunctive_search(small_index, corpus_with_ids):
    got = (
        percolate(
            small_index,
            corpus_with_ids,
            QUERIES,
            mode="disjunctive",
            min_should_match=1,
        )
        .toPandas()
        .sort_values(["query_id", "doc_id"])
        .reset_index(drop=True)
    )
    want = _forward(small_index, "disjunctive")
    pd.testing.assert_frame_equal(
        got[["query_id", "doc_id", "score_q"]].astype("int64"),
        want.astype("int64"),
    )
    # disjunctive hits for query 3 exist (the present term matches)
    # but never with full coverage
    q3 = got[got.query_id == 3]
    assert len(q3) > 0 and (q3.n_matched < 2).all()


def test_min_should_match(small_index, corpus_with_ids):
    all_hits = _forward(small_index, "disjunctive")
    got2 = (
        percolate(
            small_index,
            corpus_with_ids,
            QUERIES,
            mode="disjunctive",
            min_should_match=2,
        )
        .toPandas()
    )
    assert (got2.n_matched >= 2).all()
    assert len(got2) < len(all_hits)


def test_percolate_stream_matches_batch(
    small_index, corpus_with_ids, tmp_path
):
    d = str(tmp_path / "stream_docs")
    corpus_with_ids.selectExpr(
        "CAST(doc_id AS LONG) AS doc_id", "content"
    ).write.parquet(d)
    got = (
        percolate_stream(
            small_index,
            small_index.spark,
            d,
            "doc_id long, content string",
            QUERIES,
            mode="conjunctive",
            query_name="perc_test",
        )
        .toPandas()
        .sort_values(["query_id", "doc_id"])
        .reset_index(drop=True)
    )
    want = (
        percolate(small_index, corpus_with_ids, QUERIES, mode="conjunctive")
        .toPandas()
        .sort_values(["query_id", "doc_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_percolate_validation(small_index, corpus_with_ids):
    with pytest.raises(ValueError):
        percolate(small_index, corpus_with_ids, QUERIES, mode="fuzzy")
    with pytest.raises(ValueError):
        percolate(
            small_index, corpus_with_ids, QUERIES, min_should_match=0
        )
    with pytest.raises(ValueError):
        percolate(
            small_index,
            corpus_with_ids,
            [(i, "x", 1) for i in range(MAX_QUERIES + 1)],
        )
    # all-unseen query set -> empty frame with the contract schema
    empty = percolate(
        small_index, corpus_with_ids, [(9, "zzz qqq", 5)]
    ).toPandas()
    assert len(empty) == 0
    assert list(empty.columns) == ["doc_id", "query_id", "score_q", "n_matched"]
