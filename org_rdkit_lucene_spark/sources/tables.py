"""Table loaders.

Reference analog: SDF stream scan (``sdf/SDFParser.java:78-123``) with
transparent gzip (``ChemicalIndex.java:242-245``). Here sources are
columnar tables: Iceberg when the catalog is available, Parquet
otherwise — Spark readers handle codecs transparently, and Catalyst
pushes filters/projections into the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TPCH_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load the driver-provided parquet tables for one scale factor."""
    out = {}
    for name in TPCH_TABLES:
        p = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(p):
            out[name] = spark.read.parquet(p)
    return out


def load_corpus(spark: SparkSession, source: str) -> DataFrame:
    """Load a code corpus table ``(repo, path, commit, lang, content)``.

    ``source`` is an Iceberg table name (contains no '/' and a catalog is
    configured) or a parquet path. Column order is normalized; extra
    columns are dropped (column pruning reaches the scan).
    """
    if source.endswith(".parquet") or os.path.exists(source):
        df = spark.read.parquet(source)
    else:
        df = spark.read.format("iceberg").load(source)
    return df.select("repo", "path", "commit", "lang", "content")


def documents_as_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the driver's ``documents`` table (doc_id, text, lang, source,
    n_chars) to the engine's corpus shape. ``doc_id`` is already a stable
    integer key, so it is carried through directly."""
    p = os.path.join(sf_dir, "documents.parquet")
    df = spark.read.parquet(p)
    return df.select(
        F.col("doc_id").cast("long").alias("ext_id"),
        F.col("source").alias("repo"),
        F.concat(F.col("source"), F.lit("/doc/"), F.col("doc_id").cast("string")).alias("path"),
        F.lit("synthetic").alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )
