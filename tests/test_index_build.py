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
