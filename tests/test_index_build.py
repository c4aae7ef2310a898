"""Index build invariants: sha256, stats, decode==direct-tokenize,
block layout, config validation."""

import hashlib

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from org_rdkit_lucene_spark.config import BM25Params, IndexConfig, candidate_cap
from org_rdkit_lucene_spark.functions.tokenizer import tokenize_texts
from org_rdkit_lucene_spark.operators.query import decoded_postings


def test_sha256_invariant(small_index, small_pdf):
    """Per-row sha256(content) equality vs source (BASELINE input_hint)."""
    dm = small_index.docmeta.select("repo", "path", "commit", "sha256").toPandas()
    src = small_pdf.copy()
    src["want"] = [hashlib.sha256(c.encode()).hexdigest() for c in src["content"]]
    merged = dm.merge(src, on=["repo", "path", "commit"], validate="1:1")
    assert (merged["sha256"] == merged["want"]).all()
    assert len(merged) == len(small_pdf)


def test_stats_and_doclen(small_index, small_pdf):
    toks = tokenize_texts(small_pdf["content"])
    want_lens = toks.map(len)
    assert small_index.n_docs == len(small_pdf)
    assert small_index.avgdl == pytest.approx(want_lens.mean())
    dm = small_index.docmeta.toPandas().merge(
        small_pdf.assign(doc_len_want=want_lens), on=["repo", "path", "commit"]
    )
    assert (dm["doc_len"] == dm["doc_len_want"]).all()


def test_doc_ids_dense_and_sorted(small_index):
    dm = small_index.docmap.toPandas().sort_values(["repo", "path", "commit"])
    # dense 0..N-1, assigned in natural-key order (deterministic global rank)
    assert sorted(dm["doc_id"]) == list(range(len(dm)))
    assert (dm["doc_id"].to_numpy() == np.arange(len(dm))).all()


def test_decoded_postings_match_direct_tokenize(small_index, small_pdf):
    """Decode every block and compare (term, doc_id, tf) to a direct
    pandas tokenization of the corpus."""
    all_terms = small_index.lexicon.select("term").toPandas()["term"].tolist()
    flat = decoded_postings(small_index, all_terms).toPandas()
    docmap = small_index.docmap.toPandas()
    src = small_pdf.merge(docmap, on=["repo", "path", "commit"])
    toks = tokenize_texts(src["content"])
    rows = []
    for did, ts in zip(src["doc_id"], toks):
        s = pd.Series(ts).value_counts()
        for term, tf in s.items():
            rows.append((term, did, tf, len(ts)))
    want = pd.DataFrame(rows, columns=["term", "doc_id", "tf", "dl"])
    got = flat.sort_values(["term", "doc_id"]).reset_index(drop=True)
    want = want.sort_values(["term", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"tf": "int64", "dl": "int64"}),
        want.astype({"tf": "int64", "dl": "int64"}),
    )


def test_postings_block_layout(small_index):
    """Blocks: ≤ block_size postings, contiguous ids, sorted ranges,
    correct per-term df vs lexicon."""
    bs = small_index.cfg.block_size
    blocks = small_index.postings.toPandas()
    assert (blocks["n"] <= bs).all()
    assert (blocks["first_doc"] <= blocks["last_doc"]).all()
    per_term = blocks.groupby("term")
    # block_ids are 0..nblocks-1 and ranges are non-overlapping increasing
    for term, g in per_term:
        g = g.sort_values("block_id")
        assert list(g["block_id"]) == list(range(len(g)))
        assert (g["first_doc"].to_numpy()[1:] > g["last_doc"].to_numpy()[:-1]).all()
        # all blocks except the last are full
        assert (g["n"].to_numpy()[:-1] == bs).all()
    df_from_blocks = per_term["n"].sum().rename("df_blocks").reset_index()
    lex = small_index.lexicon.select("term", "df").toPandas()
    m = lex.merge(df_from_blocks, on="term", validate="1:1")
    assert (m["df"] == m["df_blocks"]).all()


def test_term_pruning_pushdown(small_index):
    """The term IN (...) filter must reach the parquet scan."""
    plan = small_index.postings.filter(
        F.col("term").isin(["get", "index"])
    )._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [In(term" in plan


def test_config_validation():
    with pytest.raises(ValueError):
        BM25Params(b=1.5)
    with pytest.raises(ValueError):
        BM25Params(k1=-1)
    with pytest.raises(ValueError):
        IndexConfig(block_size=0)
    with pytest.raises(ValueError):
        IndexConfig(n_salts=0)
    assert candidate_cap(10) == 100
    assert candidate_cap(50_000) == 100_000
    with pytest.raises(ValueError):
        candidate_cap(0)


def test_for_codec_rank_identical(spark, tiny_corpus, tmp_path):
    """codec='for' (Frame-of-Reference) must produce identical query
    results to the default varbyte layout on both query paths, from
    different posting bytes."""
    from org_rdkit_lucene_spark.operators.build import build_index
    from org_rdkit_lucene_spark.operators.query import search
    from org_rdkit_lucene_spark.operators.wand import search_wand

    cfg_v = IndexConfig(build_partitions=4, hot_term_df=40, n_salts=4, codec="varbyte")
    cfg_f = IndexConfig(build_partitions=4, hot_term_df=40, n_salts=4, codec="for")
    iv = build_index(spark, tiny_corpus, cfg_v, str(tmp_path / "v"))
    iff = build_index(spark, tiny_corpus, cfg_f, str(tmp_path / "f"))
    assert iff.codec == "for" and iv.codec == "varbyte"
    qs = [(1, "getIndexValue merg scorer", 10), (2, "token hash", 5)]
    a = search(iv, qs).toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = search(iff, qs).toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    import pandas as pdt

    pdt.testing.assert_frame_equal(a, b)
    c = search_wand(iff, qs).toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    pdt.testing.assert_frame_equal(a, c)
    # layouts genuinely differ on disk
    bv = iv.postings.select("tf_bytes").limit(5).toPandas()["tf_bytes"].map(bytes).tolist()
    bf = iff.postings.select("tf_bytes").limit(5).toPandas()["tf_bytes"].map(bytes).tolist()
    assert bv != bf
    # reload picks the codec up from stats.json without a cfg
    from org_rdkit_lucene_spark.operators.build import InvertedIndex

    reloaded = InvertedIndex.load(spark, str(tmp_path / "f"))
    assert reloaded.codec == "for"
    d = search(reloaded, qs).toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    pdt.testing.assert_frame_equal(a, d)


def test_codec_validation():
    with pytest.raises(ValueError):
        IndexConfig(codec="zstd")


def test_duplicate_pk_rejected(spark, tmp_path):
    pdf = pd.DataFrame(
        [("r", "p", "c", "py", "x"), ("r", "p", "c", "py", "y")],
        columns=["repo", "path", "commit", "lang", "content"],
    )
    from org_rdkit_lucene_spark.operators.build import build_index

    with pytest.raises(ValueError, match="not unique"):
        build_index(spark, spark.createDataFrame(pdf), IndexConfig(build_partitions=2), str(tmp_path / "d"))


def test_null_keys_rejected_explicitly(spark, tmp_path):
    """ADVICE r03: bare countDistinct silently dropped NULL-keyed rows,
    surfacing as a misleading 'not unique' error. NULL natural keys are
    now rejected with an explicit message (downstream natural-key joins
    are null-unsafe, so such rows would silently vanish), while unique
    non-NULL corpora still validate."""
    from org_rdkit_lucene_spark.operators.build import build_index

    pdf = pd.DataFrame(
        [("r", "p1", None, "py", "alpha beta"), ("r", "p2", None, "py", "gamma")],
        columns=["repo", "path", "commit", "lang", "content"],
    )
    with pytest.raises(ValueError, match="contains NULLs"):
        build_index(
            spark,
            spark.createDataFrame(pdf).withColumn(
                "commit", F.col("commit").cast("string")
            ),
            IndexConfig(build_partitions=2),
            str(tmp_path / "nullkey"),
        )


def test_with_positions_shared_pass(spark, tiny_corpus, tmp_path):
    """build_index(with_positions=True) writes positions.parquet from
    the SAME tokenize pass as the flat runs — the artifact's row set
    must equal the standalone re-tokenizing builder's, and the
    byte-equivalence trio (postings/lexicon/docmeta) must stay
    bit-identical to a positions-less build."""
    import os

    from org_rdkit_lucene_spark.operators.build import build_index
    from org_rdkit_lucene_spark.operators.positions import (
        build_positions,
        positions_view,
    )

    cfg = IndexConfig(build_partitions=4, hot_term_df=40, n_salts=2)
    d_one = str(tmp_path / "one_pass")
    d_two = str(tmp_path / "two_pass")
    idx1 = build_index(spark, tiny_corpus, cfg, d_one, with_positions=True)
    idx2 = build_index(spark, tiny_corpus, cfg, d_two)
    assert idx1.has_positions and not idx2.has_positions

    # same row set as the standalone builder (re-tokenizes)
    corpus_ids = tiny_corpus.join(idx2.docmap, ["repo", "path", "commit"])
    sep = build_positions(spark, corpus_ids, d_two)
    got = {tuple(r) for r in positions_view(idx1.positions).collect()}
    want = {tuple(r) for r in positions_view(sep).collect()}
    assert got == want and got

    # index artifacts identical to the positions-less build under the
    # canonical byte-equivalence law (sorted frames, encoded block
    # BYTES included — the same comparison test_merge_equivalence
    # gates on; raw parquet file bytes are not the contract, row order
    # within an output file legitimately varies with scan splits)
    p1 = idx1.postings.toPandas().sort_values(["term", "block_id"]).reset_index(drop=True)
    p2 = idx2.postings.toPandas().sort_values(["term", "block_id"]).reset_index(drop=True)
    for c in ("doc_bytes", "tf_bytes", "dl_bytes"):
        p1[c] = p1[c].map(bytes)
        p2[c] = p2[c].map(bytes)
    pd.testing.assert_frame_equal(p1, p2)
    l1 = idx1.lexicon.toPandas().sort_values("term").reset_index(drop=True)
    l2 = idx2.lexicon.toPandas().sort_values("term").reset_index(drop=True)
    pd.testing.assert_frame_equal(l1, l2)
    d1 = idx1.docmeta.toPandas().sort_values("doc_id").reset_index(drop=True)
    d2 = idx2.docmeta.toPandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(d1, d2)

    # searchable end-to-end through the indexed phrase path
    from org_rdkit_lucene_spark.operators.query import search_syntax

    out = search_syntax(idx1, None, [(1, '"def"', 5)], positions=idx1.positions)
    assert out.count() >= 0


def test_with_positions_zero_token_doc_checks_clean(spark, tmp_path):
    """A doc that tokenizes to zero tokens must not trip
    positions_cover_stream (docmeta keeps it with doc_len=0 and it has
    no positions rows — round-4 advice false positive)."""
    from org_rdkit_lucene_spark.operators.build import build_index
    from org_rdkit_lucene_spark.operators.check import check_index

    pdf = pd.DataFrame(
        {
            "ext_id": [0, 1, 2],
            "repo": ["r"] * 3,
            "path": ["a.py", "b.py", "c.py"],
            "commit": ["c0", "c1", "c2"],
            "lang": ["py"] * 3,
            "content": ["def alpha beta", "   ", "alpha gamma"],
        }
    )
    cfg = IndexConfig(build_partitions=2, hot_term_df=50, n_salts=2)
    idx = build_index(
        spark, spark.createDataFrame(pdf), cfg, str(tmp_path / "zt"),
        id_col="ext_id", with_positions=True,
    )
    rep = check_index(idx, deep=True).set_index("check")
    assert bool(rep.loc["positions_cover_stream", "passed"]), rep.to_string()
    assert bool(rep.loc["positions_match_flat_tf", "passed"])
