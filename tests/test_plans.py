"""Physical-plan contracts (SURVEY §4): pushdown, broadcast selection,
JVM-only column programs, shuffle budgets. A regression that silently
de-optimizes a plan fails here instead of surfacing as a 10x slowdown
at cluster scale."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from org_rdkit_lucene_spark.functions.text import lang_id, quality_scores, token_counts
from org_rdkit_lucene_spark.operators.dedup import dedup_exact, minhash_signatures
from org_rdkit_lucene_spark.operators.query import decoded_postings, search, search_two_phase
from org_rdkit_lucene_spark.operators.wand import search_wand
from org_rdkit_lucene_spark.plans import audit

QUERIES = [(1, "getIndexValue merg scorer", 5), (2, "token hash", 5)]


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [(i, f"someCamelCase token_{i} the quick value") for i in range(20)]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_postings_scan_prunes_to_query_terms(small_index):
    """The term IN (...) predicate must reach the parquet scan — the
    analog of Lucene's term-dictionary seek (SURVEY §4)."""
    df = decoded_postings(small_index, ["get", "index"])
    assert audit.has_pushed_term_filter(df, "term")


def test_search_broadcasts_small_sides(small_index):
    """The (query, term, weight) table is broadcast (qtf*idf pre-merged
    driver-side, so the candidate stream pays exactly ONE join); the
    only sort-merge-eligible join in the plan must not materialize."""
    plan_df = search(small_index, QUERIES)
    assert audit.count_nodes(plan_df, "BroadcastHashJoin") >= 1
    assert audit.count_nodes(plan_df, "SortMergeJoin") == 0
    assert audit.count_nodes(plan_df, "CartesianProduct") == 0
    assert audit.has_pushed_term_filter(plan_df, "term")


def test_wand_plan_prunes_and_broadcasts(small_index):
    df = search_wand(small_index, QUERIES)
    assert audit.has_pushed_term_filter(df, "term")
    assert audit.count_nodes(df, "SortMergeJoin") == 0
    assert audit.count_nodes(df, "CartesianProduct") == 0


def test_two_phase_verify_is_jvm_side(small_index, small_corpus):
    """Phase-B verification must be the built-in `contains` on the JVM,
    not a Python filter (ChemicalIndex.java:683-709 analog without the
    per-candidate JNI crossing)."""
    corpus_ids = small_corpus.join(small_index.docmap, ["repo", "path", "commit"])
    df = search_two_phase(small_index, corpus_ids, [(1, "merg", 3)])
    assert audit.count_nodes(df, "BatchEvalPython") == 0


def test_column_programs_are_jvm_only(docs_df):
    """lang_id / token_counts / quality_scores / dedup_exact are pure
    Catalyst column programs — whole-stage codegen, zero Python."""
    for op in (lang_id, token_counts, quality_scores, dedup_exact):
        audit.assert_jvm_only(op(docs_df, "doc_id", "text"))


def test_dedup_exact_single_shuffle(docs_df):
    """Exact dedup shuffles ONCE on the digest (hash groupBy/window) —
    the property that keeps it linear at 100 TB."""
    assert audit.count_shuffles(dedup_exact(docs_df, "doc_id", "text")) == 1


def test_minhash_signatures_shuffle_budget(docs_df):
    """Shingle explode + distinct + per-doc agg: bounded exchanges (no
    join, no cartesian)."""
    df = minhash_signatures(docs_df, "doc_id", "text")
    assert audit.count_nodes(df, "CartesianProduct") == 0
    assert audit.count_shuffles(df) <= 3


def test_no_rowwise_python_anywhere(small_index, docs_df):
    """input_hint: vectorized pandas/Arrow UDFs only — BatchEvalPython
    (row-at-a-time) must never appear in any engine plan."""
    for df in (
        search(small_index, QUERIES),
        search_wand(small_index, QUERIES),
        decoded_postings(small_index, ["get"]),
        minhash_signatures(docs_df, "doc_id", "text"),
    ):
        audit.assert_no_rowwise_python(df)


def test_hot_term_split_broadcasts_past_threshold(spark, small_index):
    """Past hot_broadcast_threshold the hot/cold split must be a
    broadcast (semi/anti) join, not a multi-thousand-literal In that
    bloats analysis/codegen at 100x corpus scale."""
    from org_rdkit_lucene_spark.config import IndexConfig
    from org_rdkit_lucene_spark.operators.build import encode_postings
    from org_rdkit_lucene_spark.plans import audit

    flat = small_index.flat
    hot_terms = [r["term"] for r in
                 small_index.lexicon.orderBy(F.desc("df")).limit(30).collect()]
    # threshold 0 → always broadcast-join the hot set
    cfg = IndexConfig(build_partitions=4, hot_broadcast_threshold=0)
    blocks = encode_postings(flat, cfg, small_index.avgdl, small_index.max_doc_id, hot_terms)
    plan = blocks._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert " IN (" not in plan and "isin" not in plan.lower()
    # above-threshold literal list path still used for small hot sets
    cfg2 = IndexConfig(build_partitions=4, hot_broadcast_threshold=10_000)
    blocks2 = encode_postings(flat, cfg2, small_index.avgdl, small_index.max_doc_id, hot_terms)
    audit.assert_no_rowwise_python(blocks2)


def test_facet_counts_plan_contracts(small_index):
    """Faceting must keep the scored path's contracts: pushed term
    pruning, broadcast weight join, no per-row Python, no cartesian."""
    from org_rdkit_lucene_spark.operators.query import facet_counts

    df = facet_counts(small_index, QUERIES, facet_col="lang")
    assert audit.has_pushed_term_filter(df, "term")
    assert audit.count_nodes(df, "BatchEvalPython") == 0
    assert audit.count_nodes(df, "CartesianProduct") == 0


def test_more_like_this_plan_contracts(small_index, small_corpus):
    """MLT's scored pass is the ordinary pushed-scan + broadcast
    pipeline; the anchor exclusion must be a broadcast anti-join."""
    from org_rdkit_lucene_spark.operators.query import more_like_this

    corpus_ids = small_corpus.join(small_index.docmap, ["repo", "path", "commit"])
    df = more_like_this(small_index, corpus_ids, [(1, 3, 5)])
    assert audit.has_pushed_term_filter(df, "term")
    assert audit.count_nodes(df, "BatchEvalPython") == 0
    assert audit.count_nodes(df, "SortMergeJoin") == 0
    assert audit.count_nodes(df, "CartesianProduct") == 0


def test_shingles_bind_once_in_plan(docs_df):
    """bind_array regression guard: the tokenizer chain (its split)
    must appear ONCE in the optimized shingle plan. Before binding,
    size()/slice() references spliced the whole chain per use and
    codegen re-ran it per shingle position (measured 15x at sf0.1)."""
    from pyspark.sql import functions as F

    from org_rdkit_lucene_spark.operators.dedup import shingles_column

    df = docs_df.select(F.explode(shingles_column("text", 8)).alias("g"))
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("split(") <= 2, plan


def test_phrase_positions_scan_pushes_terms(spark, tmp_path):
    """Each positional phrase side must reach the parquet scan as a
    pushed term = 'w' filter (the .prx term seek analog) and stay free
    of row-wise Python."""
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F401

    from org_rdkit_lucene_spark.operators.positions import (
        build_positions,
        search_phrase_positions,
    )

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "content": ["alpha beta gamma", "beta alpha"]})
    )
    pos = build_positions(spark, docs, str(tmp_path / "pp"))
    df = search_phrase_positions(pos, [(1, "alpha beta", 5)])
    assert audit.has_pushed_term_filter(df, "term")
    assert audit.count_nodes(df, "BatchEvalPython") == 0


def test_field_phrase_plan_jvm_only_no_content(spark, tmp_path):
    """The field-scoped phrase law must stay pure Catalyst over
    metadata: no Python evaluator nodes and no content column in the
    plan (the clause reads docmeta fields only)."""
    import pandas as pd

    from org_rdkit_lucene_spark.config import IndexConfig
    from org_rdkit_lucene_spark.operators.build import build_index
    from org_rdkit_lucene_spark.operators.query import search_syntax

    rows = [
        (i, "orgx", f"src/util/f{i}.py", f"c{i}", "py", f"alpha doc{i}")
        for i in range(6)
    ]
    pdf = pd.DataFrame(
        rows, columns=["ext_id", "repo", "path", "commit", "lang", "content"]
    )
    idx = build_index(
        spark,
        spark.createDataFrame(pdf),
        IndexConfig(build_partitions=2, hot_term_df=50, n_salts=2),
        str(tmp_path / "fpp"),
        id_col="ext_id",
    )
    df = search_syntax(idx, None, [(1, 'path:"src util" alpha', 5)])
    plan = audit.physical_plan(df)
    assert "content" not in plan
    assert audit.count_nodes(df, "BatchEvalPython") == 0
    assert audit.count_nodes(df, "CartesianProduct") == 0
    # the full field-expansion matrix (prefix/wildcard/fuzzy/range/
    # regexp) rides the same single-docmeta-scan law: pure Catalyst,
    # no content column, no Python evaluator
    df = search_syntax(
        idx, None,
        [(2, "path:util* repo:o?gx lang:py~ path:[a TO m] lang:/p./ alpha", 5)],
    )
    plan = audit.physical_plan(df)
    assert "content" not in plan
    assert audit.count_nodes(df, "BatchEvalPython") == 0
    assert audit.count_nodes(df, "CartesianProduct") == 0


def test_round5_continuation_plan_contracts(small_index):
    """Taxonomy facets, block join, and query-time join stay
    JVM-only: no Python evaluators, no cartesian products, pushed term
    pruning; taxonomy's prefix fan-out is exactly ONE Generate."""
    from org_rdkit_lucene_spark.operators.query import (
        search_block_join,
        search_join,
        taxonomy_facet_counts,
    )

    tax = taxonomy_facet_counts(small_index, QUERIES, depth=3, top_n=5)
    assert audit.count_nodes(tax, "BatchEvalPython") == 0
    assert audit.count_nodes(tax, "CartesianProduct") == 0
    assert audit.count_nodes(tax, "Generate") == 1
    assert audit.has_pushed_term_filter(tax, "term")

    for df in (
        search_block_join(small_index, QUERIES, "repo", "total"),
        search_join(small_index, QUERIES, "repo", "repo", "max"),
    ):
        assert audit.count_nodes(df, "BatchEvalPython") == 0
        assert audit.count_nodes(df, "CartesianProduct") == 0
        assert audit.has_pushed_term_filter(df, "term")


def test_multi_phrase_plan_pushes_terms(spark, tmp_path):
    """Multi-phrase scans carry the explicit term IN pushdown and stay
    free of Python evaluators (the phrase-positions contract extended
    to slot alternatives)."""
    from org_rdkit_lucene_spark.operators.positions import (
        build_positions,
        search_multi_phrase,
    )

    rows = [(i, "alpha beta gamma delta") for i in range(12)]
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "content"])
    )
    pos = build_positions(spark, docs, str(tmp_path / "mp_plan"))
    df = search_multi_phrase(
        pos, [(1, [["alpha", "beta"], ["gamma"]], 5)]
    )
    assert audit.has_pushed_term_filter(df, "term")
    assert audit.count_nodes(df, "BatchEvalPython") == 0
    assert audit.count_nodes(df, "CartesianProduct") == 0
