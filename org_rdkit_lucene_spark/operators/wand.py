"""Block-max WAND top-k kernel over compressed postings.

Replaces the reference's delegated Lucene top-k collector
(``TopScoreDocCollector`` call sites ``ChemicalIndex.java:486,631``;
bounded-heap + tie-break law in ``SubstructureHitQueue.java:98-118``
and the short-circuit "can't beat current k-th score" rule in
``SubstructureScoreDocCollector.java:76-84``).

Algorithm — batch-oriented block-max pruning (score-at-a-time variant
of block-max WAND, suited to Spark's shared-nothing execution):

1. The doc-id space is split into contiguous SHARDS. Every posting
   block is routed to each shard its [first_doc, last_doc] range
   overlaps; inside a shard only docs within the shard range are
   scored, so each doc is scored completely in exactly one shard (its
   postings for all query terms land there) and shard-local top-k is
   globally safe.
2. Per (query, shard) group the kernel sweeps block boundaries
   into elementary SEGMENTS. Each segment's upper bound is the sum of
   covering blocks' ``idf*qtf*max_tf_norm`` (the block-max metadata
   written at build time) — computable with NO block decoding.
3. Segments are processed in descending upper-bound order, decoding
   each covering block at most once (cached), scoring docs exactly, and
   maintaining the running top-k threshold θ. A segment whose quantized
   upper bound is strictly below the quantized θ cannot contribute —
   the remaining segments (sorted) are skipped wholesale. This is the
   WAND skip: hot-term blocks dominated by θ are never decoded.
4. Shard-local top-k results merge globally with the K2 tie-break
   (score_q DESC, doc_id ASC).

Results are identical to the pure-DataFrame path (tested) — rank AND
quantized score. All kernel math is numpy over Arrow batches.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from org_rdkit_lucene_spark.functions.codecs import decode_ints, delta_decode
from org_rdkit_lucene_spark.operators.build import InvertedIndex
from org_rdkit_lucene_spark.operators.query import RESULT_SCHEMA, tokenize_queries


def _make_kernel(
    k1: float,
    b: float,
    avgdl: float,
    quant: int,
    conjunctive: bool,
    codec: str = "varbyte",
    kill: tuple[np.ndarray, np.ndarray] | None = None,
):
    kill_ids, kill_ords = kill if kill is not None else (None, None)

    def shard_kernel(spdf: pd.DataFrame) -> pd.DataFrame:
        """One SHARD group holding every query's block rows: queries
        share a raw-decode cache (docs + query-independent tf_norm per
        physical block). Grouping is per (query, shard) — each group
        holds one query — because the sweep, not decode, dominates and
        fine groups balance better; the cache structure still pays off
        when one query's segments revisit a block."""
        raw_cache: dict[tuple, tuple] = {}

        def raw_decode(key, row, seg_ord):
            if key not in raw_cache:
                docs = delta_decode(
                    int(row["first_doc"]), bytes(row["doc_bytes"]), int(row["n"]), codec
                )
                tfs = decode_ints(bytes(row["tf_bytes"]), codec).astype(np.float64)
                dls = decode_ints(bytes(row["dl_bytes"]), codec).astype(np.float64)
                if kill_ids is not None and len(kill_ids):
                    # drop tombstoned versions: a kill from segment
                    # ordinal j removes docs of blocks with ordinal < j
                    pos = np.searchsorted(kill_ids, docs)
                    pos_c = np.minimum(pos, len(kill_ids) - 1)
                    dead = (kill_ids[pos_c] == docs) & (kill_ords[pos_c] > seg_ord)
                    if dead.any():
                        keep = ~dead
                        docs, tfs, dls = docs[keep], tfs[keep], dls[keep]
                tf_norm = tfs * (k1 + 1.0) / (tfs + k1 * (1.0 - b + b * dls / avgdl))
                raw_cache[key] = (docs, tf_norm)
            return raw_cache[key]

        outs = []
        for _, pdf in spdf.groupby("query_id", sort=False):
            out = query_kernel(pdf.reset_index(drop=True), raw_decode)
            if len(out):
                outs.append(out)
        if not outs:
            return pd.DataFrame(
                {"query_id": pd.Series(dtype="int32"),
                 "doc_id": pd.Series(dtype="int64"),
                 "score_q": pd.Series(dtype="int64")}
            )
        return pd.concat(outs, ignore_index=True)

    def query_kernel(pdf: pd.DataFrame, raw_decode) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        k = int(pdf["k"].iloc[0])
        n_terms = int(pdf["n_terms"].iloc[0])
        shard_lo = int(pdf["shard_lo"].iloc[0])
        shard_hi = int(pdf["shard_hi"].iloc[0])  # exclusive
        seg_ords = (
            pdf["seg_ord"].to_numpy(np.int64)
            if "seg_ord" in pdf.columns
            else np.zeros(len(pdf), dtype=np.int64)
        )

        # block table (clip ranges to shard)
        firsts = pdf["first_doc"].to_numpy(np.int64)
        lasts = pdf["last_doc"].to_numpy(np.int64)
        los = np.maximum(firsts, shard_lo)
        his = np.minimum(lasts + 1, shard_hi)  # exclusive
        ubs = (pdf["idf"].to_numpy(np.float64) * pdf["qtf"].to_numpy(np.float64)
               * pdf["max_tf_norm"].to_numpy(np.float64))
        term_codes = pd.factorize(pdf["term"])[0]

        # elementary segments from block boundaries
        bounds = np.unique(np.concatenate([los, his]))
        if len(bounds) < 2:
            return pd.DataFrame(columns=["query_id", "doc_id", "score_q"])
        seg_lo, seg_hi = bounds[:-1], bounds[1:]
        n_seg = len(seg_lo)
        # coverage via interval sweep: for each block add ub on [lo, hi)
        start_idx = np.searchsorted(bounds, los)
        end_idx = np.searchsorted(bounds, his)
        seg_ub = np.zeros(n_seg + 1)
        np.add.at(seg_ub, start_idx, ubs)
        np.add.at(seg_ub, end_idx, -ubs)
        seg_ub = np.cumsum(seg_ub[:-1])
        if conjunctive:
            # a segment not covered by all query terms can't produce a hit
            cover = np.zeros((n_seg + 1,), dtype=np.int64)
            per_term_cover = np.zeros(n_seg, dtype=np.int64)
            for t in range(term_codes.max() + 1):
                m = term_codes == t
                cnt = np.zeros(n_seg + 1, dtype=np.int64)
                np.add.at(cnt, start_idx[m], 1)
                np.add.at(cnt, end_idx[m], -1)
                per_term_cover += np.cumsum(cnt[:-1]) > 0
            seg_ok = per_term_cover == n_terms
        else:
            seg_ok = seg_ub > 0

        order = np.argsort(-seg_ub, kind="stable")
        order = order[seg_ok[order]]

        decoded: dict[int, tuple] = {}
        idfs = pdf["idf"].to_numpy(np.float64)
        qtfs = pdf["qtf"].to_numpy(np.float64)
        terms_arr = pdf["term"].to_numpy()
        block_ids = pdf["block_id"].to_numpy(np.int64)

        def decode(bi: int):
            if bi not in decoded:
                key = (terms_arr[bi], int(block_ids[bi]), int(seg_ords[bi]))
                docs, tf_norm = raw_decode(key, pdf.iloc[bi], int(seg_ords[bi]))
                decoded[bi] = (docs, qtfs[bi] * idfs[bi] * tf_norm)
            return decoded[bi]

        # blocks covering each segment: precompute lists via interval index
        # (n_blocks small per group; loop is over blocks, vectorized inside)
        top_docs = np.empty(0, dtype=np.int64)
        top_scores = np.empty(0, dtype=np.int64)
        theta_q = None
        skipped = 0
        for si in order:
            ub_q = math.floor(seg_ub[si] * quant + 0.5)
            if theta_q is not None and ub_q < theta_q:
                skipped += len(order) - skipped  # remaining all pruned
                break
            lo, hi = seg_lo[si], seg_hi[si]
            cover = np.flatnonzero((los < hi) & (his > lo))
            if len(cover) == 0:
                continue
            doc_parts, contrib_parts, term_parts = [], [], []
            for bi in cover:
                docs, contrib = decode(int(bi))
                m = (docs >= lo) & (docs < hi)
                if not m.any():
                    continue
                doc_parts.append(docs[m])
                contrib_parts.append(contrib[m])
                term_parts.append(np.full(int(m.sum()), term_codes[bi], dtype=np.int64))
            if not doc_parts:
                continue
            dd = np.concatenate(doc_parts)
            cc = np.concatenate(contrib_parts)
            tt = np.concatenate(term_parts)
            uniq, inv = np.unique(dd, return_inverse=True)
            sums = np.zeros(len(uniq))
            np.add.at(sums, inv, cc)
            if conjunctive:
                nmatch = np.zeros(len(uniq), dtype=np.int64)
                # distinct terms per doc: (doc, term) pairs unique then count
                pair = inv.astype(np.int64) * (term_codes.max() + 1) + tt
                upair = np.unique(pair)
                np.add.at(nmatch, (upair // (term_codes.max() + 1)).astype(np.int64), 1)
                keep = nmatch == n_terms
                uniq, sums = uniq[keep], sums[keep]
            if len(uniq) == 0:
                continue
            sq = np.floor(sums * quant + 0.5).astype(np.int64)
            top_docs = np.concatenate([top_docs, uniq])
            top_scores = np.concatenate([top_scores, sq])
            # AMORTIZED truncation for large k: an exact (score desc,
            # doc asc) lexsort per segment is O(k log k) per segment —
            # at reference-scale k (10⁵-10⁶, LuceneBenchmark.java:358-364)
            # that dominates. Instead let the pool grow to 2k, truncate
            # exactly then (amortized O(log k)/candidate), and maintain
            # θ each segment via an O(n) partition — θ only needs the
            # k-th best SCORE (pruning is strict <, so score ties at θ
            # are still admitted and resolved by the final truncation).
            if len(top_docs) > 2 * k:
                sel = np.lexsort((top_docs, -top_scores))[:k]
                top_docs, top_scores = top_docs[sel], top_scores[sel]
            if len(top_docs) >= k:
                theta_q = int(np.partition(top_scores, -k)[-k])
        if len(top_docs) == 0:
            return pd.DataFrame(columns=["query_id", "doc_id", "score_q"])
        if len(top_docs) > k:  # exact shard-local top-k for the merge
            sel = np.lexsort((top_docs, -top_scores))[:k]
            top_docs, top_scores = top_docs[sel], top_scores[sel]
        return pd.DataFrame({"query_id": qid, "doc_id": top_docs, "score_q": top_scores})

    return shard_kernel


def search_wand(
    index: InvertedIndex,
    queries: list[tuple[int, str, int]],
    mode: str = "disjunctive",
    n_shards: int | None = None,
) -> DataFrame:
    """Block-max WAND top-k; result-identical to :func:`query.search`.

    Queries' term blocks are broadcast-joined, routed to doc-range
    shards (parallelism without cross-shard score splitting), processed
    by the numpy kernel per (query, shard), then globally merged.
    """
    if mode not in ("disjunctive", "conjunctive"):
        raise ValueError(f"unknown mode {mode!r}")
    spark = index.spark
    qterms = tokenize_queries(queries, index.cfg.tokenizer)
    if len(qterms) == 0:
        return spark.createDataFrame([], RESULT_SCHEMA)
    if n_shards is None:
        n_shards = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    max_doc_id = index.max_doc_id if index.max_doc_id >= 0 else index.n_docs - 1
    shard_size = max(1, math.ceil((max_doc_id + 1) / n_shards))

    terms = qterms["term"].unique().tolist()
    qdf = F.broadcast(spark.createDataFrame(qterms))
    lex = F.broadcast(index.lexicon.filter(F.col("term").isin(terms)).select("term", "idf"))
    blocks = (
        index.postings.filter(F.col("term").isin(terms))
        .join(qdf, "term")
        .join(lex, "term")
    )
    # route each block to every shard its doc range overlaps
    blocks = blocks.withColumn(
        "shard",
        F.explode(
            F.sequence(
                (F.col("first_doc") / F.lit(shard_size)).cast("int"),
                (F.col("last_doc") / F.lit(shard_size)).cast("int"),
            )
        ),
    ).withColumn("shard_lo", F.col("shard").cast("long") * F.lit(shard_size)).withColumn(
        "shard_hi", (F.col("shard").cast("long") + 1) * F.lit(shard_size)
    )

    p = index.cfg.bm25
    # segmented views expose delta-scale tombstones; broadcast them
    # into the kernel so dead versions never occupy top-k slots
    kill = index.kill_pairs() if hasattr(index, "kill_pairs") else None
    kernel = _make_kernel(
        p.k1, p.b, index.avgdl, 10**p.score_decimals, mode == "conjunctive",
        codec=getattr(index, "codec", "varbyte"), kill=kill,
    )
    # per-(query, shard) groups: measured faster than one-group-per-
    # shard with an internal query loop — the per-query segment sweep
    # (not block decode) dominates, and fine-grained groups let the
    # scheduler balance heavy (hot-term) queries across cores
    local = blocks.groupBy("query_id", "shard").applyInPandas(
        kernel, schema="query_id int, doc_id long, score_q long"
    )
    kmap = F.broadcast(
        spark.createDataFrame(
            [(qid, k) for qid, _, k in queries], "query_id int, k int"
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score_q"), F.asc("doc_id"))
    return (
        local.join(kmap, "query_id")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.col("k"))
        .select("query_id", "rank", "doc_id", "score_q")
    )
