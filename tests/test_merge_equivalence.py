"""North-star determinism gates:

1. posting-list BYTE-equivalence: index built at 1, 4, and 16 build
   partitions, and with salting forced on vs off, yields identical
   postings blocks (bytes included), lexicon, and docmeta.
2. checkpoint-restart determinism: stage 1 run on a partition subset,
   then resumed, yields an index byte-identical to an uninterrupted
   build (analog of resume-from-PK, ChemicalIndex.java:248-270).
"""

import pandas as pd
import pytest

from org_rdkit_lucene_spark.config import IndexConfig
from org_rdkit_lucene_spark.operators.build import build_index


def _postings_key(idx) -> pd.DataFrame:
    p = idx.postings.toPandas().sort_values(["term", "block_id"]).reset_index(drop=True)
    p["doc_bytes"] = p["doc_bytes"].map(bytes)
    p["tf_bytes"] = p["tf_bytes"].map(bytes)
    p["dl_bytes"] = p["dl_bytes"].map(bytes)
    return p


def _assert_identical(a, b):
    pa, pb = _postings_key(a), _postings_key(b)
    pd.testing.assert_frame_equal(pa, pb)
    la = a.lexicon.toPandas().sort_values("term").reset_index(drop=True)
    lb = b.lexicon.toPandas().sort_values("term").reset_index(drop=True)
    pd.testing.assert_frame_equal(la, lb)
    da = a.docmeta.toPandas().sort_values("doc_id").reset_index(drop=True)
    db = b.docmeta.toPandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(da, db)


@pytest.mark.parametrize("parts,hot_df,salts", [(1, 10**9, 1), (4, 40, 4), (16, 8, 8)])
def test_merge_equivalence_across_partitionings(spark, tiny_corpus, tmp_path, parts, hot_df, salts):
    """Same corpus, wildly different partitioning/salting → same bytes."""
    cfg = IndexConfig(build_partitions=parts, hot_term_df=hot_df, n_salts=salts)
    idx = build_index(spark, tiny_corpus, cfg, str(tmp_path / f"idx_{parts}"))
    ref_cfg = IndexConfig(build_partitions=2, hot_term_df=10**9, n_salts=1)
    ref = build_index(spark, tiny_corpus, ref_cfg, str(tmp_path / "ref"))
    _assert_identical(idx, ref)


def test_checkpoint_resume_byte_identical(spark, tiny_corpus, tmp_path):
    cfg = IndexConfig(build_partitions=8, hot_term_df=60, n_salts=4)
    # uninterrupted build
    full = build_index(spark, tiny_corpus, cfg, str(tmp_path / "full"))
    # interrupted: stage 1 on parts {0,1,2} only → partial (returns None)
    d = str(tmp_path / "resumed")
    partial = build_index(spark, tiny_corpus, cfg, d, only_parts=[0, 1, 2])
    assert partial is None
    # resume: completes remaining parts + finalizes
    resumed = build_index(spark, tiny_corpus, cfg, d)
    assert resumed is not None
    _assert_identical(full, resumed)


def test_orphan_committed_run_not_double_counted(spark, tiny_corpus, tmp_path):
    """The resume-duplication hazard: a flat run that COMMITTED
    (_SUCCESS written) right before a crash that lost the manifest
    update must be discarded on resume — its parts are still 'todo',
    get rebuilt into a new run, and reading both would double-count
    postings. Simulated by rolling the manifest back after a partial
    build, then resuming with a DIFFERENT only_parts grouping."""
    import json
    import os

    from org_rdkit_lucene_spark.operators.build import _manifest_path, _read_manifest

    cfg = IndexConfig(build_partitions=8, hot_term_df=60, n_salts=4)
    full = build_index(spark, tiny_corpus, cfg, str(tmp_path / "full2"))

    d = str(tmp_path / "orphan")
    build_index(spark, tiny_corpus, cfg, d, only_parts=[0, 1, 2])
    # crash window: the run dir committed but the manifest update was lost
    m = _read_manifest(d)
    assert m["completed_parts"] == [0, 1, 2]
    with open(_manifest_path(d), "w") as f:
        json.dump({"completed_parts": [], "part_lineage": {}, "finalized": False}, f)
    run_dirs = os.listdir(os.path.join(d, "flat"))
    assert len(run_dirs) == 1  # the orphan, with _SUCCESS present
    assert os.path.exists(os.path.join(d, "flat", run_dirs[0], "_SUCCESS"))
    # resume with a different grouping, then finalize
    build_index(spark, tiny_corpus, cfg, d, only_parts=[0, 1])
    resumed = build_index(spark, tiny_corpus, cfg, d)
    assert resumed is not None
    _assert_identical(full, resumed)


def test_resume_skips_completed_parts(spark, tiny_corpus, tmp_path):
    from org_rdkit_lucene_spark.operators.build import _read_manifest

    cfg = IndexConfig(build_partitions=4)
    d = str(tmp_path / "skip")
    build_index(spark, tiny_corpus, cfg, d, only_parts=[1])
    m = _read_manifest(d)
    assert m["completed_parts"] == [1]
    build_index(spark, tiny_corpus, cfg, d, only_parts=[1, 3])
    m = _read_manifest(d)
    assert m["completed_parts"] == [1, 3]
    idx = build_index(spark, tiny_corpus, cfg, d)
    assert idx is not None
    assert _read_manifest(d)["finalized"]


def test_add_indexes_byte_identical_to_full_build(spark, tiny_pdf, tmp_path):
    """IndexWriter.addIndexes analog: two indexes built over disjoint
    halves, merged WITHOUT re-tokenizing, must be byte-identical to a
    from-scratch build over the concatenated corpus — postings bytes,
    lexicon (idf from the exact merged N), docmeta, and stats."""
    from org_rdkit_lucene_spark.streaming.incremental import add_indexes

    pdf = tiny_pdf.copy()
    pdf.insert(0, "ext_id", range(len(pdf)))
    half = len(pdf) // 2
    cfg = IndexConfig(build_partitions=4, hot_term_df=40, n_salts=4)
    a = build_index(spark, spark.createDataFrame(pdf.iloc[:half]), cfg,
                    str(tmp_path / "a"), id_col="ext_id")
    b = build_index(spark, spark.createDataFrame(pdf.iloc[half:]), cfg,
                    str(tmp_path / "b"), id_col="ext_id")
    merged = add_indexes(spark, [str(tmp_path / "a"), str(tmp_path / "b")],
                         cfg, str(tmp_path / "m"))
    full = build_index(spark, spark.createDataFrame(pdf), cfg,
                       str(tmp_path / "full"), id_col="ext_id")
    _assert_identical(merged, full)
    assert (merged.n_docs, merged.total_dl, merged.avgdl, merged.max_doc_id) == (
        full.n_docs, full.total_dl, full.avgdl, full.max_doc_id
    )
    # and the merged index answers queries identically to the rebuild
    from org_rdkit_lucene_spark.operators.query import search

    qs = [(1, "merg join spark", 10), (2, "hash table scan", 10)]
    got = search(merged, qs).toPandas().sort_values(["query_id", "rank"])
    want = search(full, qs).toPandas().sort_values(["query_id", "rank"])
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want.reset_index(drop=True))


def test_add_indexes_rejects_overlap(spark, tiny_pdf, tmp_path):
    """No silent version merging: overlapping doc keys raise (the
    upsert/segment path owns versioning)."""
    from org_rdkit_lucene_spark.streaming.incremental import add_indexes

    pdf = tiny_pdf.copy()
    pdf.insert(0, "ext_id", range(len(pdf)))
    cfg = IndexConfig(build_partitions=2, hot_term_df=10**9, n_salts=1)
    build_index(spark, spark.createDataFrame(pdf.iloc[:120]), cfg,
                str(tmp_path / "o1"), id_col="ext_id")
    build_index(spark, spark.createDataFrame(pdf.iloc[100:]), cfg,
                str(tmp_path / "o2"), id_col="ext_id")
    with pytest.raises(ValueError, match="overlap"):
        add_indexes(spark, [str(tmp_path / "o1"), str(tmp_path / "o2")],
                    cfg, str(tmp_path / "om"))
