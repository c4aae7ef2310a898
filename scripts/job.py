#!/usr/bin/env python
"""Cluster job entrypoint — the ``spark-submit --py-files`` contract.

North-star requirement: the build "runs via spark-submit --py-files on
multi-executor clusters". This script is the submitted driver program;
the engine package ships as a zip built by ``scripts/make_pyfiles.py``:

    python scripts/make_pyfiles.py                      # → dist/orls.zip
    spark-submit --master <cluster> --py-files dist/orls.zip \
        scripts/job.py build  --corpus corpus.parquet --index-dir /idx
    spark-submit --py-files dist/orls.zip scripts/job.py search \
        --index-dir /idx --queries '1:parseIndexBuffer merge:10'

Modes:
  build   SPIMI index build (resumable; re-submit to resume)
  search  BM25 top-k (``--mode conjunctive`` for all-terms semantics,
          ``--engine wand`` for the block-max kernel)

Prints one JSON line with results/metrics. Uses the active
SparkSession provided by spark-submit (no master hardcoded here).
Exercised end-to-end by ``tests/test_spark_submit.py``.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--corpus", required=True, help="parquet path or Iceberg table")
    b.add_argument("--index-dir", required=True)
    b.add_argument("--partitions", type=int, default=32)
    b.add_argument("--id-col", default=None)

    s = sub.add_parser("search")
    s.add_argument("--index-dir", required=True)
    s.add_argument("--queries", required=True, help="semicolon-separated id:text:k")
    s.add_argument("--mode", default="disjunctive", choices=["disjunctive", "conjunctive"])
    s.add_argument("--engine", default="dataframe", choices=["dataframe", "wand"])
    args = ap.parse_args()

    # imports resolve from --py-files on the executors and driver
    from pyspark.sql import SparkSession

    from org_rdkit_lucene_spark.config import IndexConfig
    from org_rdkit_lucene_spark.operators.build import InvertedIndex, build_index
    from org_rdkit_lucene_spark.operators.query import search
    from org_rdkit_lucene_spark.operators.wand import search_wand
    from org_rdkit_lucene_spark.sources.tables import load_corpus

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.cmd == "build":
        cfg = IndexConfig(build_partitions=args.partitions)
        corpus = load_corpus(spark, args.corpus)
        if args.id_col:
            corpus = spark.read.parquet(args.corpus)  # keep the id column
        t0 = time.time()
        idx = build_index(spark, corpus, cfg, args.index_dir, id_col=args.id_col)
        sec = time.time() - t0
        out = {
            "cmd": "build",
            "finalized": idx is not None,
            "n_docs": idx.n_docs if idx else None,
            "seconds": round(sec, 3),
            "files_per_sec": round(idx.n_docs / sec, 1) if idx and sec > 0 else None,
        }
    else:
        idx = InvertedIndex.load(spark, args.index_dir)
        queries = []
        for spec in args.queries.split(";"):
            # id : text : k — text may itself contain ':'
            qid, rest = spec.split(":", 1)
            text, k = rest.rsplit(":", 1)
            queries.append((int(qid), text, int(k)))
        fn = search_wand if args.engine == "wand" else search
        t0 = time.time()
        rows = fn(idx, queries, mode=args.mode).collect()
        out = {
            "cmd": "search",
            "engine": args.engine,
            "seconds": round(time.time() - t0, 3),
            "results": [
                {"query_id": r["query_id"], "rank": r["rank"],
                 "doc_id": r["doc_id"], "score_q": r["score_q"]}
                for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"]))
            ],
        }

    print(json.dumps(out))
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
