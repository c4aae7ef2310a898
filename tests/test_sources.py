"""Source parity: transparent compressed-text ingest (S3 analog — the
reference gzip-wraps SDF streams, ChemicalIndex.java:242-245; Spark
readers handle codecs transparently) and corpus loading."""

import gzip
import json

import pytest
from pyspark.sql import functions as F

from org_rdkit_lucene_spark.config import IndexConfig
from org_rdkit_lucene_spark.operators.build import build_index
from org_rdkit_lucene_spark.operators.query import search
from org_rdkit_lucene_spark.sources.tables import load_corpus


def test_gzip_json_ingest_to_index(spark, tiny_pdf, tmp_path):
    """Corpus rows shipped as gzipped JSON-lines are read transparently
    and index+query identically to the DataFrame path."""
    src = tmp_path / "ingest"
    src.mkdir()
    rows = tiny_pdf.head(80).to_dict("records")
    with gzip.open(src / "part-0.jsonl.gz", "wt") as f:
        for r in rows[:40]:
            f.write(json.dumps(r) + "\n")
    with gzip.open(src / "part-1.jsonl.gz", "wt") as f:
        for r in rows[40:]:
            f.write(json.dumps(r) + "\n")

    df = spark.read.json(str(src)).select("repo", "path", "commit", "lang", "content")
    assert df.count() == 80

    idx_gz = build_index(spark, df, IndexConfig(build_partitions=2), str(tmp_path / "ig"))
    ref_df = spark.createDataFrame(tiny_pdf.head(80))
    idx_ref = build_index(spark, ref_df, IndexConfig(build_partitions=2), str(tmp_path / "ir"))

    q = [(1, "getIndexValue merg", 5)]
    a = search(idx_gz, q).toPandas().sort_values("rank").reset_index(drop=True)
    b = search(idx_ref, q).toPandas().sort_values("rank").reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)


def test_load_corpus_parquet(spark, tiny_pdf, tmp_path):
    p = str(tmp_path / "c.parquet")
    tiny_pdf.to_parquet(p, index=False)
    df = load_corpus(spark, p)
    assert df.columns == ["repo", "path", "commit", "lang", "content"]
    assert df.count() == len(tiny_pdf)


def test_load_corpus_column_pruning_reaches_scan(spark, tiny_pdf, tmp_path):
    """Selecting two columns must prune the content column at the scan."""
    from org_rdkit_lucene_spark.plans import audit

    p = str(tmp_path / "c2.parquet")
    tiny_pdf.to_parquet(p, index=False)
    df = load_corpus(spark, p).select("repo", "lang")
    plan = audit.physical_plan(df)
    assert "ReadSchema" in plan and "content" not in plan.split("ReadSchema")[1][:200]
