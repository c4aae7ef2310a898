"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry runs the REAL engine (index build + query over
the persisted inverted index) on the driver-provided ``documents``
table; ``oracle_sql()`` holds the equivalent DuckDB SQL generated to
the engine's exact semantics (same tokenizer/BM25/quantization/
tie-break — see org_rdkit_lucene_spark.oracle.sqlgen).
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from org_rdkit_lucene_spark.config import IndexConfig
from org_rdkit_lucene_spark.operators.build import InvertedIndex, build_index
from org_rdkit_lucene_spark.operators.query import (
    hit_counts,
    search,
    search_after,
    search_two_phase,
)
from org_rdkit_lucene_spark.oracle import sqlgen
from org_rdkit_lucene_spark.sources.tables import documents_as_corpus

# ---------------------------------------------------------------------------
# fixed query workloads (terms drawn from the documents vocabulary;
# one absent term for the zero-hit case — FIXTURES.md §2)

DISJ_QUERIES = [
    (1, "merge join spark", 10),
    (2, "hash table scan", 10),
    (3, "customer window filter", 5),
    (4, "zzzmissingterm", 10),
    (5, "batch", 3),
]
CONJ_QUERIES = [
    (11, "merge join", 10),
    (12, "slow vector agg", 10),
    (13, "dup stream", 5),
]
PHRASE_QUERIES = [
    (21, "batch batch", 5),
    (22, "table scan", 5),
    (23, "merge part window", 3),
]
PAGE_QUERY = (31, "merge join spark", 10)
BLOCKLIST = [3, 7, 11, 42]
LOOKUP_DOC_ID = 42
EXACT_ANCHOR_DOC_ID = 7

_INDEX_CACHE: dict[str, InvertedIndex] = {}
_CORPUS_CACHE: dict[str, DataFrame] = {}


def _index_for(spark: SparkSession, sf_dir: str) -> InvertedIndex:
    key = os.path.abspath(sf_dir)
    if key not in _INDEX_CACHE:
        corpus = documents_as_corpus(spark, sf_dir)
        d = tempfile.mkdtemp(prefix="orls_idx_")
        cfg = IndexConfig(build_partitions=16, hot_term_df=1024, n_salts=8)
        idx = build_index(spark, corpus, cfg, d, id_col="ext_id")
        assert idx is not None
        _INDEX_CACHE[key] = idx
        _CORPUS_CACHE[key] = corpus.withColumnRenamed("ext_id", "doc_id")
    return _INDEX_CACHE[key]


def _corpus_for(spark: SparkSession, sf_dir: str) -> DataFrame:
    _index_for(spark, sf_dir)
    return _CORPUS_CACHE[os.path.abspath(sf_dir)]


# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 disjunctive top-k over sf0.001 documents."""
    idx = _index_for(spark, "/root/testdata/sf0.001")
    return search(idx, DISJ_QUERIES, mode="disjunctive")


def _q_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    return search(_index_for(spark, sf_dir), DISJ_QUERIES, mode="disjunctive")


def _q_conjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    return search(_index_for(spark, sf_dir), CONJ_QUERIES, mode="conjunctive")


def _q_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _index_for(spark, sf_dir)
    return search_two_phase(idx, _corpus_for(spark, sf_dir), PHRASE_QUERIES)


def _q_hit_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hit_counts(_index_for(spark, sf_dir), DISJ_QUERIES).orderBy("query_id")


def _q_search_after(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5 keyset pagination: page 2 (ranks 11-20) of PAGE_QUERY."""
    idx = _index_for(spark, sf_dir)
    qid, text, k = PAGE_QUERY
    page1 = search(idx, [(qid, text, k)]).orderBy("rank").collect()
    last = page1[-1]
    return search_after(idx, [(qid, text, k)], {qid: (last["score_q"], last["doc_id"])})


def _q_lexicon(spark: SparkSession, sf_dir: str) -> DataFrame:
    lex = _index_for(spark, sf_dir).lexicon
    return (
        lex.select("term", "df", "cf")
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(30)
    )


def _q_docmeta(spark: SparkSession, sf_dir: str) -> DataFrame:
    dm = _index_for(spark, sf_dir).docmeta
    return dm.select("doc_id", "doc_len", "sha256").orderBy("doc_id")


def _q_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    dm = _index_for(spark, sf_dir).docmeta
    return dm.filter(F.col("doc_id") == LOOKUP_DOC_ID).select("doc_id", "lang", "sha256")


def _q_exact_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4: exact body match via the sha256 invariant column."""
    dm = _index_for(spark, sf_dir).docmeta
    anchor = dm.filter(F.col("doc_id") == EXACT_ANCHOR_DOC_ID).select(
        F.col("sha256").alias("anchor_sha")
    )
    return (
        dm.join(F.broadcast(anchor), dm["sha256"] == anchor["anchor_sha"])
        .select("doc_id", "sha256")
        .orderBy("doc_id")
    )


def _q_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: PK blocklist anti-join (setIgnorePKs analog)."""
    dm = _index_for(spark, sf_dir).docmeta
    bl = spark.createDataFrame([(int(i),) for i in BLOCKLIST], "doc_id long")
    return dm.join(F.broadcast(bl), "doc_id", "left_anti").select("doc_id").orderBy("doc_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q1_bm25_disjunctive": _q_disjunctive,
        "q5_bm25_conjunctive": _q_conjunctive,
        "q6_two_phase_verify": _q_two_phase,
        "a4_hit_counts": _q_hit_counts,
        "k5_search_after": _q_search_after,
        "b_lexicon_top_df": _q_lexicon,
        "b_docmeta_sha256": _q_docmeta,
        "q2_point_lookup": _q_point_lookup,
        "q4_exact_match": _q_exact_match,
        "p2_blocklist": _q_blocklist,
    }


def _page2_sql() -> str:
    qid, text, k = PAGE_QUERY
    base = sqlgen.bm25_topk_sql([(qid, text, 2 * k)])
    # ranks 11..20 renumbered 1..10 — keyset-paginated page 2
    return f"""
WITH page AS ({base})
SELECT query_id, CAST(rank - {k} AS INTEGER) AS rank, doc_id, score_q
FROM page WHERE rank > {k} AND rank <= {2 * k} ORDER BY rank"""


def oracle_sql() -> dict[str, str]:
    return {
        "q1_bm25_disjunctive": sqlgen.bm25_topk_sql(DISJ_QUERIES, "disjunctive"),
        "q5_bm25_conjunctive": sqlgen.bm25_topk_sql(CONJ_QUERIES, "conjunctive"),
        "q6_two_phase_verify": sqlgen.two_phase_sql(PHRASE_QUERIES),
        "a4_hit_counts": sqlgen.hit_counts_sql(DISJ_QUERIES),
        "k5_search_after": _page2_sql(),
        "b_lexicon_top_df": sqlgen.lexicon_sql(30),
        "b_docmeta_sha256": sqlgen.docmeta_sql(),
        "q2_point_lookup": sqlgen.point_lookup_sql(LOOKUP_DOC_ID),
        "q4_exact_match": sqlgen.exact_match_sql(EXACT_ANCHOR_DOC_ID),
        "p2_blocklist": sqlgen.blocklist_sql(BLOCKLIST),
    }
