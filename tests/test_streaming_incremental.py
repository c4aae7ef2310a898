"""Structured Streaming incremental indexing: delta segments must be
rank- AND score-identical to a monolithic rebuild over base+streamed
docs, on both query paths; replays must be idempotent."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from org_rdkit_lucene_spark.config import IndexConfig
from org_rdkit_lucene_spark.operators.build import build_index
from org_rdkit_lucene_spark.operators.query import hit_counts, search
from org_rdkit_lucene_spark.operators.wand import search_wand
from org_rdkit_lucene_spark.sources.fixtures import make_corpus_pdf
from org_rdkit_lucene_spark.streaming.incremental import (
    SegmentedIndex,
    index_stream,
    list_segments,
)

QUERIES = [
    (1, "getIndexValue merg scorer", 10),
    (2, "token pars hash", 10),
    (3, "zzzmissing", 5),
    (4, "main data", 7),
]

STREAM_SCHEMA = T.StructType(
    [
        T.StructField("ext_id", T.LongType()),
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)


@pytest.fixture(scope="module")
def incremental_setup(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("stream")
    pdf = make_corpus_pdf(n_docs=300, seed=7)
    pdf.insert(0, "ext_id", range(len(pdf)))
    base_pdf, delta1, delta2 = pdf.iloc[:200], pdf.iloc[200:250], pdf.iloc[250:]

    cfg = IndexConfig(build_partitions=4, hot_term_df=60, n_salts=4)
    base_dir = str(tmp / "base")
    base = build_index(spark, spark.createDataFrame(base_pdf), cfg, base_dir, id_col="ext_id")
    assert base is not None

    src = tmp / "incoming"
    src.mkdir()
    delta1.to_parquet(src / "b1.parquet", index=False)
    delta2.to_parquet(src / "b2.parquet", index=False)

    stream = (
        spark.readStream.schema(STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = index_stream(stream, base_dir, cfg, str(tmp / "ckpt"))
    q.awaitTermination(timeout=300)

    full = build_index(
        spark, spark.createDataFrame(pdf), cfg, str(tmp / "full"), id_col="ext_id"
    )
    seg = SegmentedIndex.load(spark, base_dir, cfg)
    return {"seg": seg, "full": full, "base_dir": base_dir, "cfg": cfg,
            "stream_src": src, "tmp": tmp, "spark": spark}


def _sorted(df) -> pd.DataFrame:
    p = df.toPandas()
    return p.sort_values(list(p.columns)).reset_index(drop=True)


def test_segments_created(incremental_setup):
    segs = list_segments(incremental_setup["base_dir"])
    assert len(segs) == 2  # maxFilesPerTrigger=1 → one segment per file


def test_merged_stats_exact(incremental_setup):
    seg, full = incremental_setup["seg"], incremental_setup["full"]
    assert seg.n_docs == full.n_docs == 306  # 300 + 2% near-dups
    assert seg.total_dl == full.total_dl
    assert seg.avgdl == full.avgdl  # exact: both are total_dl / n
    assert seg.max_doc_id == full.max_doc_id


def test_merged_lexicon_matches_rebuild(incremental_setup):
    seg, full = incremental_setup["seg"], incremental_setup["full"]
    a = _sorted(seg.lexicon.select("term", "df", "cf", "idf"))
    b = _sorted(full.lexicon.select("term", "df", "cf", "idf"))
    pd.testing.assert_frame_equal(a, b)


def test_search_rank_identical_to_rebuild(incremental_setup):
    seg, full = incremental_setup["seg"], incremental_setup["full"]
    a = _sorted(search(seg, QUERIES, mode="disjunctive"))
    b = _sorted(search(full, QUERIES, mode="disjunctive"))
    pd.testing.assert_frame_equal(a, b)
    ac = _sorted(search(seg, QUERIES[:2], mode="conjunctive"))
    bc = _sorted(search(full, QUERIES[:2], mode="conjunctive"))
    pd.testing.assert_frame_equal(ac, bc)


def test_wand_rank_identical_to_rebuild(incremental_setup):
    """WAND over the merged view relies on the safe (max_tf, min_dl)
    bound re-derivation — segment blocks were encoded under a different
    avgdl than the merged corpus."""
    seg, full = incremental_setup["seg"], incremental_setup["full"]
    a = _sorted(search_wand(seg, QUERIES, mode="disjunctive"))
    b = _sorted(search_wand(full, QUERIES, mode="disjunctive"))
    pd.testing.assert_frame_equal(a, b)
    # and WAND(seg) == DataFrame(seg)
    c = _sorted(search(seg, QUERIES, mode="disjunctive"))
    pd.testing.assert_frame_equal(a, c)


def test_hit_counts_match(incremental_setup):
    seg, full = incremental_setup["seg"], incremental_setup["full"]
    pd.testing.assert_frame_equal(
        _sorted(hit_counts(seg, QUERIES)), _sorted(hit_counts(full, QUERIES))
    )


def test_replay_idempotent(incremental_setup):
    """Re-running the stream over the same source + checkpoint adds no
    new segments (checkpoint) and a forced re-process of a batch id
    overwrites, not duplicates."""
    spark = incremental_setup["spark"]
    base_dir = incremental_setup["base_dir"]
    cfg = incremental_setup["cfg"]
    before = list_segments(base_dir)
    stream = (
        spark.readStream.schema(STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(incremental_setup["stream_src"]))
    )
    q = index_stream(stream, base_dir, cfg, str(incremental_setup["tmp"] / "ckpt"))
    q.awaitTermination(timeout=120)
    assert list_segments(base_dir) == before
    seg = SegmentedIndex.load(spark, base_dir, cfg)
    assert seg.n_docs == 306


def test_sha256_invariant_covers_segments(incremental_setup):
    """The per-row content sha256 invariant holds across base + deltas."""
    seg = incremental_setup["seg"]
    full = incremental_setup["full"]
    a = _sorted(seg.docmeta.select("doc_id", "sha256", "doc_len"))
    b = _sorted(full.docmeta.select("doc_id", "sha256", "doc_len"))
    pd.testing.assert_frame_equal(a, b)


def test_stream_carries_positions(spark, tmp_path_factory):
    """End-to-end through the real Structured Streaming path: when the
    base index has a positions artifact, every micro-batch segment
    writes its own (auto-detected by build_segment inside foreachBatch)
    and phrase search over the merged view is rank-identical to
    positions rebuilt over base+streamed docs."""
    from org_rdkit_lucene_spark.operators.positions import (
        build_positions,
        search_phrase_positions,
    )

    tmp = tmp_path_factory.mktemp("stream_pos")
    pdf = make_corpus_pdf(n_docs=150, seed=19)
    pdf.insert(0, "ext_id", range(len(pdf)))
    base_pdf, delta = pdf.iloc[:100], pdf.iloc[100:].copy()
    delta["content"] = delta["content"] + " streamed phrase probe"

    cfg = IndexConfig(build_partitions=4, hot_term_df=60, n_salts=4)
    base_dir = str(tmp / "base")
    build_index(spark, spark.createDataFrame(base_pdf), cfg, base_dir, id_col="ext_id")
    build_positions(
        spark, spark.createDataFrame(base_pdf), base_dir,
        content_col="content", id_col="ext_id",
    )

    src = tmp / "incoming"
    src.mkdir()
    delta.iloc[:25].to_parquet(src / "b1.parquet", index=False)
    delta.iloc[25:].to_parquet(src / "b2.parquet", index=False)
    stream = (
        spark.readStream.schema(STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = index_stream(stream, base_dir, cfg, str(tmp / "ckpt"))
    q.awaitTermination(timeout=300)

    seg = SegmentedIndex.load(spark, base_dir, cfg)
    full_pdf = pd.concat([base_pdf, delta], ignore_index=True)
    truth_dir = str(tmp / "truth")
    os.makedirs(truth_dir, exist_ok=True)
    truth_pos = build_positions(
        spark, spark.createDataFrame(full_pdf), truth_dir,
        content_col="content", id_col="ext_id",
    )
    qs = [(1, "streamed phrase probe", 10), (2, "returns the", 10)]
    got = _sorted(search_phrase_positions(seg.positions, qs))
    want = _sorted(search_phrase_positions(truth_pos, qs))
    pd.testing.assert_frame_equal(got, want)
    assert (got.query_id == 1).sum() == 10  # streamed docs are phrase-hit


def test_many_segments_view_stays_correct(spark, tmp_path_factory):
    """20 delta segments (the shape a long-running stream produces
    between compactions): the merged view must stay rank-identical to a
    rebuild, tombstone_frac must reflect the accumulated updates, and
    compaction must fold it all back to one green monolith."""
    from org_rdkit_lucene_spark.operators.check import check_segmented
    from org_rdkit_lucene_spark.streaming.incremental import (
        build_segment,
        compact,
        segments_root,
    )

    tmp = tmp_path_factory.mktemp("manyseg")
    pdf = make_corpus_pdf(n_docs=80, seed=41)
    pdf.insert(0, "ext_id", range(len(pdf)))
    cfg = IndexConfig(build_partitions=2, hot_term_df=60, n_salts=2)
    base_dir = str(tmp / "base")
    build_index(spark, spark.createDataFrame(pdf), cfg, base_dir, id_col="ext_id")

    latest = {int(e): c for e, c in zip(pdf.ext_id, pdf.content)}
    for b in range(20):
        ids = [(b * 3 + j) % len(pdf) for j in range(3)]
        upd = pdf[pdf.ext_id.isin(ids)].copy()
        upd["content"] = upd["content"] + f" manyseg probe {b}"
        for e, c in zip(upd.ext_id, upd.content):
            latest[int(e)] = c
        build_segment(
            spark, spark.createDataFrame(upd),
            os.path.join(segments_root(base_dir), f"seg-{b:08d}"),
            cfg, id_col="ext_id",
        )
    seg = SegmentedIndex.load(spark, base_dir, cfg)
    assert len(seg.segment_dirs) == 20
    assert seg.n_docs == len(pdf)
    assert seg.tombstone_frac() > 0.2  # many re-updates accumulated

    final = pdf.copy()
    final["content"] = final.ext_id.map(lambda e: latest[int(e)])
    truth = build_index(
        spark, spark.createDataFrame(final), cfg, str(tmp / "truth"), id_col="ext_id"
    )
    qs = [(1, "manyseg probe", 10), (2, "getIndexValue merg scorer", 10)]
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)  # frac > policy, expected
        pd.testing.assert_frame_equal(
            _sorted(search(seg, qs, mode="disjunctive")),
            _sorted(search(truth, qs, mode="disjunctive")),
        )
        compacted = compact(spark, base_dir, cfg, str(tmp / "compacted"))
    pd.testing.assert_frame_equal(
        _sorted(search(compacted, qs, mode="disjunctive")),
        _sorted(search(truth, qs, mode="disjunctive")),
    )
    rep = check_segmented(seg)
    assert rep[~rep.passed].empty, rep[~rep.passed].to_string()
