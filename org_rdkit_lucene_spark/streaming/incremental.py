"""Structured Streaming incremental indexing — segment-based deltas.

Reference analog: Lucene's buffered-docs → flushed-segment model that
the reference delegates to ``IndexWriter`` (call sites
``ChemicalIndex.java:864-876``; incremental adds via delete-then-add
upsert at ``:801``). Spark-first re-expression:

- the batch-built index (:mod:`operators.build`) is the BASE segment;
- a stream of new documents (``readStream``) produces one DELTA
  segment per micro-batch via ``foreachBatch`` — per-segment postings,
  docmeta, lexicon (df/cf only) and exact stats, written under
  ``<base>/segments/seg-<batch>``, idempotent per batch id (re-running
  a batch after a crash overwrites the same directory, so
  exactly-once composes with the stream checkpoint);
- :class:`SegmentedIndex` presents base+deltas through the SAME
  surface as :class:`InvertedIndex` (``postings`` / ``lexicon`` /
  ``docmeta`` / ``n_docs`` / ``avgdl``), so every query path —
  DataFrame BM25, block-max WAND, two-phase verify, pagination —
  works over the merged view unchanged.

Rank identity with a full rebuild is exact, not approximate:

- ``avgdl`` is recomputed from the EXACT integer token totals
  (sum of per-segment ``total_dl`` / sum of ``n_docs``), the same
  float a monolithic rebuild computes;
- per-term ``df``/``cf`` sum across segments (doc sets are disjoint);
  ``idf`` is recomputed from the merged ``N``;
- block-max metadata stored at segment-encode time used a *segment*
  ``avgdl``, so :class:`SegmentedIndex` re-derives a safe per-block
  upper bound from the stored ``(max_tf, min_dl)`` under the merged
  ``avgdl`` (tf_norm is increasing in tf, decreasing in dl) — WAND
  skipping stays correct while global stats drift.

Tested: ``tests/test_streaming_incremental.py`` asserts rank- and
score-identical top-k (both query paths) vs a from-scratch rebuild
over base+streamed docs, plus restart idempotence.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from org_rdkit_lucene_spark.config import IndexConfig
from org_rdkit_lucene_spark.operators.build import (
    POSTINGS_SCHEMA,
    InvertedIndex,
    _make_cold_encoder,
    _make_spimi_fn,
)


def segments_root(index_dir: str) -> str:
    return os.path.join(index_dir, "segments")


def list_segments(index_dir: str) -> list[str]:
    root = segments_root(index_dir)
    if not os.path.isdir(root):
        return []
    return sorted(
        os.path.join(root, d)
        for d in os.listdir(root)
        if d.startswith("seg-")
        and os.path.exists(os.path.join(root, d, "stats.json"))
    )


def build_segment(
    spark: SparkSession,
    batch: DataFrame,
    seg_dir: str,
    cfg: IndexConfig,
    id_col: str = "ext_id",
) -> None:
    """Encode one micro-batch of docs as a self-contained delta segment.

    ``batch`` must carry the corpus shape plus an externally-supplied
    unique integer id (streaming arrival order is not deterministic, so
    ids must come from the data — the reference's data-supplied
    ``pkField`` configuration, ``LuceneBenchmark.java:745-755``).
    Written atomically: parquet outputs first, ``stats.json`` last (a
    segment without stats is ignored by :func:`list_segments`).
    """
    n_parts = max(1, min(cfg.build_partitions, 8))
    ids = batch.select(
        F.col(id_col).cast("long").alias("doc_id"),
        "repo", "path", "commit", "lang", "content",
    )
    # micro-batches are small: one SPIMI pass, one term-sorted encode
    flat = (
        ids.select("doc_id", "content", F.lit(0).cast("int").alias("build_part"))
        .repartition(n_parts)
        .mapInPandas(
            _make_spimi_fn(cfg),
            schema="doc_id long, term string, tf int, dl int, build_part int",
        )
        .drop("build_part")
        .persist()
    )
    stats_row = ids.join(
        flat.groupBy("doc_id").agg(F.first("dl").alias("doc_len")), "doc_id", "left"
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.coalesce(F.col("doc_len"), F.lit(0))).alias("total_dl"),
        F.max("doc_id").alias("max_id"),
    ).collect()[0]
    n, total_dl = int(stats_row["n"]), int(stats_row["total_dl"] or 0)
    seg_avgdl = (total_dl / n) if n else 1.0

    docmeta = ids.join(
        flat.groupBy("doc_id").agg(F.first("dl").alias("doc_len")), "doc_id", "left"
    ).select(
        "doc_id", "repo", "path", "commit", "lang",
        F.sha2(F.col("content"), 256).alias("sha256"),
        F.coalesce(F.col("doc_len"), F.lit(0)).alias("doc_len"),
    )
    docmeta.write.mode("overwrite").parquet(os.path.join(seg_dir, "docmeta.parquet"))

    lex = flat.groupBy("term").agg(F.count("*").alias("df"), F.sum("tf").alias("cf"))
    lex.write.mode("overwrite").parquet(os.path.join(seg_dir, "lexicon.parquet"))

    blocks = (
        flat.repartition(n_parts, "term")
        .sortWithinPartitions("term", "doc_id")
        .mapInPandas(_make_cold_encoder(cfg, seg_avgdl or 1.0), schema=POSTINGS_SCHEMA)
    )
    blocks.write.mode("overwrite").parquet(os.path.join(seg_dir, "postings.parquet"))
    flat.unpersist()

    tmp = os.path.join(seg_dir, "stats.json.tmp")
    with open(tmp, "w") as f:
        json.dump(
            {
                "n_docs": n,
                "total_dl": total_dl,
                "avgdl": seg_avgdl,
                "max_doc_id": int(stats_row["max_id"] if stats_row["max_id"] is not None else -1),
            },
            f,
        )
    os.replace(tmp, os.path.join(seg_dir, "stats.json"))


def index_stream(
    stream: DataFrame,
    base_index_dir: str,
    cfg: IndexConfig,
    checkpoint_dir: str,
    id_col: str = "ext_id",
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Attach a document stream to an index: every micro-batch becomes a
    delta segment. ``foreachBatch`` + per-batch-id directories +
    last-write-of-stats atomicity make replays idempotent, composing
    with the stream checkpoint for effective exactly-once."""
    spark = stream.sparkSession

    def handle(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        seg = os.path.join(segments_root(base_index_dir), f"seg-{batch_id:08d}")
        build_segment(spark, batch, seg, cfg, id_col=id_col)

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


@dataclass
class SegmentedIndex:
    """Base index + delta segments behind the :class:`InvertedIndex`
    query surface — ``search``/``search_wand``/``hit_counts``/
    ``search_two_phase`` work unchanged over the merged view."""

    spark: SparkSession
    base: InvertedIndex
    segment_dirs: list[str]
    n_docs: int = field(init=False)
    total_dl: int = field(init=False)
    avgdl: float = field(init=False)
    max_doc_id: int = field(init=False)

    def __post_init__(self) -> None:
        n, dl, mx = self.base.n_docs, self.base.total_dl, self.base.max_doc_id
        for d in self.segment_dirs:
            with open(os.path.join(d, "stats.json")) as f:
                s = json.load(f)
            n += s["n_docs"]
            dl += s["total_dl"]
            mx = max(mx, s["max_doc_id"])
        self.n_docs, self.total_dl, self.max_doc_id = n, dl, mx
        self.avgdl = (dl / n) if n else 0.0

    @property
    def cfg(self) -> IndexConfig:
        return self.base.cfg

    @property
    def codec(self) -> str:
        return getattr(self.base, "codec", "varbyte")

    @property
    def index_dir(self) -> str:
        return self.base.index_dir

    @classmethod
    def load(
        cls, spark: SparkSession, index_dir: str, cfg: IndexConfig | None = None
    ) -> "SegmentedIndex":
        base = InvertedIndex.load(spark, index_dir, cfg)
        return cls(spark, base, list_segments(index_dir))

    def _union(self, name: str) -> DataFrame:
        df = getattr(self.base, name)
        for d in self.segment_dirs:
            df = df.unionByName(
                self.spark.read.parquet(os.path.join(d, f"{name}.parquet")),
                allowMissingColumns=True,
            )
        return df

    @property
    def docmeta(self) -> DataFrame:
        return self._union("docmeta")

    @property
    def postings(self) -> DataFrame:
        """Union of all segments' blocks with the block-max bound
        re-derived for the MERGED avgdl from stored (max_tf, min_dl) —
        the stored max_tf_norm was computed under each segment's own
        avgdl and is not a valid bound once stats drift."""
        p = self.cfg.bm25
        raw = self._union("postings")
        safe = (
            F.col("max_tf").cast("double")
            * F.lit(p.k1 + 1.0)
            / (
                F.col("max_tf")
                + F.lit(p.k1)
                * (F.lit(1.0 - p.b) + F.lit(p.b) * F.col("min_dl") / F.lit(self.avgdl))
            )
        )
        return raw.withColumn("max_tf_norm", safe)

    @property
    def lexicon(self) -> DataFrame:
        """Merged per-term stats: df/cf sum across disjoint segments;
        idf recomputed under the merged N (same formula as stage 3 of
        the batch build, so scores match a full rebuild exactly)."""
        merged = (
            self._union("lexicon")
            .groupBy("term")
            .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))
        )
        return merged.withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.lit(float(self.n_docs)) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
