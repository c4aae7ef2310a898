"""Positional postings — the indexed ``PhraseQuery`` path.

Lucene 3.6 stores term positions in the .prx file and PhraseQuery
walks them (the reference's phrase surface goes through
``MultiFieldQueryParser`` / the standard analyzer's positional field,
``ChemicalIndex.java:482-485``); the engine's two-phase path instead
verifies phrases by substring against STORED bodies
(``operators/query.py::search_two_phase``). This module adds the true
index-side alternative: a ``positions.parquet`` table
``(term, doc_id, pos)`` written from the analyzed token stream, and a
phrase search that never touches document content —

    phrase w1..wn matches doc d at p  ⇔  (wi, d, p + i - 1) ∈ positions

evaluated as an n-way join over per-term pushed scans. Ranking is the
deterministic integer law (phrase occurrence count DESC, doc_id ASC)
— Lucene's PhraseQuery scores by phrase freq; occurrence count is its
exact integer core, so the DuckDB twin agrees without float laws.

Scale shape: the positions table is token-volume-sized but every
query side is a pushed ``term = 'w'`` scan (PushedFilters); the n-way
join keys on (doc_id, position arithmetic), a uniform composite key.
No stored bodies are read — at 100 TB the content column never moves.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from org_rdkit_lucene_spark.functions.tokenizer import tokenize_text, tokens_column

POSITIONS_NAME = "positions.parquet"


def build_positions(
    spark: SparkSession,
    corpus: DataFrame,
    index_dir: str,
    content_col: str = "content",
    id_col: str = "doc_id",
    profile=None,
) -> DataFrame:
    """Write the positional postings table (term, doc_id, pos) from
    the SAME analyzed token stream the index uses (0-based positions
    over the post-analysis stream — the slop-law stream). Idempotent:
    skips when already committed."""
    from org_rdkit_lucene_spark.functions.tokenizer import DEFAULT_PROFILE

    prof = profile or DEFAULT_PROFILE
    out = os.path.join(index_dir, POSITIONS_NAME)
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        pos = corpus.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.posexplode(tokens_column(content_col, prof)).alias("pos", "term"),
        ).select("term", "doc_id", F.col("pos").cast("long").alias("pos"))
        # TERM-CLUSTERED layout (same law as postings): written in
        # corpus order every row group would span most of the
        # vocabulary and the pushed `term = w` predicate could never
        # skip a row group — each phrase word would re-read the whole
        # token-volume-sized table. Repartition+sort by term makes the
        # parquet min/max stats selective, so a phrase query reads
        # only its words' slices at any corpus size.
        n_parts = max(pos.sparkSession.sparkContext.defaultParallelism, 8)
        pos = pos.repartition(n_parts, "term").sortWithinPartitions(
            "term", "doc_id", "pos"
        )
        pos.write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)


def load_positions(spark: SparkSession, index_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(index_dir, POSITIONS_NAME))


def search_phrase_positions(
    positions: DataFrame,
    queries: list[tuple[int, str, int]],
    profile=None,
) -> DataFrame:
    """Indexed PhraseQuery: top-k docs per query containing the exact
    analyzed phrase, ranked by occurrence count DESC then doc_id ASC
    (quantization-free — counts are exact integers). Queries whose
    phrase tokenizes empty return no rows; single-token phrases
    degenerate to term-occurrence counting.

    Plan per query: one pushed ``term = wi`` scan per phrase word,
    joined on (doc_id, pos offset); the per-query plans union. The
    final per-query top-k rides one bounded window."""
    from org_rdkit_lucene_spark.functions.tokenizer import DEFAULT_PROFILE

    prof = profile or DEFAULT_PROFILE
    spark = positions.sparkSession
    parts = []
    for qid, text, k in queries:
        words = tokenize_text(text, prof)
        if not words:
            continue
        base = (
            positions.filter(F.col("term") == words[0])
            .select(F.col("doc_id"), F.col("pos"))
        )
        for i, w in enumerate(words[1:], start=1):
            nxt = positions.filter(F.col("term") == w).select(
                F.col("doc_id").alias("d2"), F.col("pos").alias("p2")
            )
            base = base.join(
                nxt,
                (F.col("doc_id") == F.col("d2")) & (F.col("p2") == F.col("pos") + i),
            ).select("doc_id", "pos")
        parts.append(
            base.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_occ"))
            .select(
                F.lit(qid).cast("int").alias("query_id"),
                "doc_id",
                "n_occ",
                F.lit(k).cast("int").alias("k"),
            )
        )
    if not parts:
        return spark.createDataFrame(
            [], "query_id int, rank int, doc_id long, n_occ long"
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    w = Window.partitionBy("query_id").orderBy(F.desc("n_occ"), F.asc("doc_id"))
    return (
        u.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.col("k"))
        .select("query_id", "rank", "doc_id", F.col("n_occ").cast("long").alias("n_occ"))
    )


def search_phrase_bm25(
    index,
    positions: DataFrame,
    queries: list[tuple[int, str, int]],
    profile=None,
) -> DataFrame:
    """Lucene PhraseQuery SCORING analog: top-k ranked by BM25 over the
    PHRASE frequency — the reference's PhraseQuery scores
    ``tf(phraseFreq) · Σ idf(term_i) · norm`` (Lucene 3.6
    PhraseScorer / DefaultSimilarity; reached via the parser,
    ``ChemicalIndex.java:482-485``) — re-expressed under the engine's
    Okapi law: ``score = Σ idf_wi · phrase_tf_norm`` with
    ``phrase_tf_norm = f·(k1+1) / (f + k1·(1-b + b·dl/avgdl))`` where
    ``f`` is the exact adjacency occurrence count. ``search_phrase_
    positions`` is the count-ranked primitive; this is the
    relevance-ranked surface. Same quantized-score + tie-break law as
    every BM25 path (score_q DESC, doc_id ASC).

    Plan: per-phrase pushed positions joins (term-clustered scans) →
    occurrence counts, one broadcast of the (query, idf_sum, k) table
    (idf comes from the index lexicon via a pushed term filter —
    driver-side map, same pattern as the scoring stream), one join to
    metadata-scale docmeta for dl, one bounded rank window. No content
    column moves."""
    from org_rdkit_lucene_spark.functions.tokenizer import DEFAULT_PROFILE

    prof = profile or DEFAULT_PROFILE
    spark = positions.sparkSession
    p = index.cfg.bm25
    words_by_q = {qid: tokenize_text(text, prof) for qid, text, _ in queries}
    all_words = sorted({w for ws in words_by_q.values() for w in ws})
    idf_map = {
        r["term"]: float(r["idf"])
        for r in index.lexicon.filter(F.col("term").isin(all_words))
        .select("term", "idf").collect()
    } if all_words else {}
    occ = search_phrase_positions(
        positions, [(qid, text, 2**31 - 1) for qid, text, _ in queries], prof
    ).select("query_id", "doc_id", "n_occ")
    meta = F.broadcast(
        spark.createDataFrame(
            [
                (qid, sum(idf_map.get(w, 0.0) for w in words_by_q[qid]), int(k))
                for qid, _, k in queries
                if words_by_q[qid]
            ],
            "query_id int, idf_sum double, k int",
        )
    )
    dl = index.docmeta.select("doc_id", F.col("doc_len").cast("double").alias("dl"))
    scored = (
        occ.join(meta, "query_id")
        .join(dl, "doc_id")
        .withColumn(
            "score_raw",
            F.col("idf_sum")
            * (F.col("n_occ") * F.lit(p.k1 + 1.0))
            / (
                F.col("n_occ")
                + F.lit(p.k1)
                * (F.lit(1.0 - p.b) + F.lit(p.b) * F.col("dl") / F.lit(index.avgdl))
            ),
        )
        .withColumn(
            "score_q",
            F.floor(F.col("score_raw") * F.lit(10.0 ** p.score_decimals) + F.lit(0.5))
            .cast("long"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score_q"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.col("k"))
        .select("query_id", "rank", "doc_id", "score_q")
    )


def phrase_ok_counts(
    positions: DataFrame,
    rows: list[tuple[int, str, int]],
    profile=None,
) -> DataFrame:
    """Per-candidate phrase-clause satisfaction counts over the
    positional postings — the verify stage :func:`operators.query.
    search_syntax` uses when an index carries positions (Lucene's
    parser runs PhraseQuery against the index, ``ChemicalIndex.java:
    482-485``; stored bodies never move). ``rows`` =
    ``[(query_id, phrase_text, slop)]``; returns ``(query_id, doc_id,
    n_ok)`` where ``n_ok`` counts the query's phrase clauses the doc
    satisfies under the analyzed-stream law: words in order at
    positions ``p1 < … < pn`` with ``pn - p1 <= n-1+slop`` (``slop=0``
    = exact adjacency, evaluated with the cheaper equality join). A
    clause whose text analyzes to zero tokens is INERT — the parser
    analog of Lucene dropping an empty PhraseQuery — so callers must
    size their required counts over non-empty clauses only.

    Plan: per clause, one pushed ``term = wi`` scan per word joined on
    (doc_id, position arithmetic), DISTINCT existence per doc; clause
    plans union and one groupBy counts satisfied clauses."""
    from org_rdkit_lucene_spark.functions.tokenizer import DEFAULT_PROFILE

    prof = profile or DEFAULT_PROFILE
    spark = positions.sparkSession
    parts = []
    for i, (qid, text, slop) in enumerate(rows):
        words = tokenize_text(text, prof)
        if not words:
            continue
        if int(slop) <= 0:
            base = positions.filter(F.col("term") == words[0]).select(
                "doc_id", "pos"
            )
            for j, w in enumerate(words[1:], start=1):
                nxt = positions.filter(F.col("term") == w).select(
                    F.col("doc_id").alias("d2"), F.col("pos").alias("p2")
                )
                base = base.join(
                    nxt,
                    (F.col("doc_id") == F.col("d2"))
                    & (F.col("p2") == F.col("pos") + j),
                ).select("doc_id", "pos")
        else:
            bound = len(words) - 1 + int(slop)
            base = positions.filter(F.col("term") == words[0]).select(
                "doc_id", F.col("pos").alias("p1"), F.col("pos").alias("prev")
            )
            for w in words[1:]:
                nxt = positions.filter(F.col("term") == w).select(
                    F.col("doc_id").alias("d2"), F.col("pos").alias("p2")
                )
                base = base.join(
                    nxt,
                    (F.col("doc_id") == F.col("d2"))
                    & (F.col("p2") > F.col("prev"))
                    & (F.col("p2") - F.col("p1") <= F.lit(bound)),
                ).select("doc_id", "p1", F.col("p2").alias("prev"))
        parts.append(
            base.select("doc_id").distinct().select(
                F.lit(qid).cast("int").alias("query_id"),
                "doc_id",
                F.lit(i).cast("int").alias("ph"),
            )
        )
    if not parts:
        return spark.createDataFrame([], "query_id int, doc_id long, n_ok long")
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy("query_id", "doc_id").agg(
        F.countDistinct("ph").cast("long").alias("n_ok")
    )


def search_slop_positions(
    positions: DataFrame,
    queries: list[tuple[int, str, int, int]],
    profile=None,
) -> DataFrame:
    """Indexed SLOPPY phrase (PhraseQuery.setSlop / span-near analog)
    over the positional postings: queries = [(query_id, text, slop,
    k)]; doc d matches when its analyzed stream holds the phrase words
    IN ORDER at positions p1 < … < pn with span (pn - p1) <= n-1+slop
    — the engine's existing ``_slop_match`` law, evaluated index-side
    with no stored bodies. ``n_spans`` counts ALL qualifying ordered
    position tuples (a deterministic integer; overlaps count), ranked
    DESC then doc_id ASC, bounded by k.

    Plan per query: pushed per-term scans joined on doc_id with the
    order and span inequalities as join filters — the span bound is
    applied at EVERY step (p_i - p1 <= bound), not just the last, so
    intermediate tuple growth stays bounded by the window size."""
    from org_rdkit_lucene_spark.functions.tokenizer import DEFAULT_PROFILE

    prof = profile or DEFAULT_PROFILE
    spark = positions.sparkSession
    parts = []
    for qid, text, slop, k in queries:
        words = tokenize_text(text, prof)
        if not words:
            continue
        bound = len(words) - 1 + max(0, int(slop))
        base = positions.filter(F.col("term") == words[0]).select(
            "doc_id", F.col("pos").alias("p1"), F.col("pos").alias("prev")
        )
        for w in words[1:]:
            nxt = positions.filter(F.col("term") == w).select(
                F.col("doc_id").alias("d2"), F.col("pos").alias("p2")
            )
            base = base.join(
                nxt,
                (F.col("doc_id") == F.col("d2"))
                & (F.col("p2") > F.col("prev"))
                & (F.col("p2") - F.col("p1") <= F.lit(bound)),
            ).select("doc_id", "p1", F.col("p2").alias("prev"))
        parts.append(
            base.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_spans"))
            .select(
                F.lit(qid).cast("int").alias("query_id"),
                "doc_id",
                "n_spans",
                F.lit(k).cast("int").alias("k"),
            )
        )
    if not parts:
        return spark.createDataFrame(
            [], "query_id int, rank int, doc_id long, n_spans long"
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    w = Window.partitionBy("query_id").orderBy(F.desc("n_spans"), F.asc("doc_id"))
    return (
        u.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.col("k"))
        .select(
            "query_id", "rank", "doc_id", F.col("n_spans").cast("long").alias("n_spans")
        )
    )
