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
    spark-submit --py-files dist/orls.zip scripts/job.py build \
        --config job.json

Modes:
  build   SPIMI index build (resumable; re-submit to resume)
  search  BM25 top-k (``--mode conjunctive`` for all-terms semantics,
          ``--engine wand`` for the block-max kernel)

Config-file source (S8 — analog of the reference's file-based settings
with ``${...}`` placeholder substitution, LuceneBenchmark.java:716-743):
``--config job.json`` supplies per-mode sections whose string values may
reference ``vars`` entries as ``${name}``; explicit CLI flags override
config values, built-in defaults apply last:

    {"vars":   {"root": "/data/run1"},
     "build":  {"corpus": "${root}/corpus.parquet",
                "index_dir": "${root}/idx", "partitions": 64},
     "search": {"index_dir": "${root}/idx",
                "queries": "1:merge join:10", "engine": "wand"}}

Prints one JSON line with results/metrics. Uses the active
SparkSession provided by spark-submit (no master hardcoded here).
Exercised end-to-end by ``tests/test_spark_submit.py``; config
resolution by ``tests/test_job_config.py``.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

DEFAULTS = {
    "build": {"partitions": 32, "id_col": None},
    "search": {"mode": "disjunctive", "engine": "dataframe"},
    "check": {"deep": False},
}
REQUIRED = {
    "build": ["corpus", "index_dir"],
    "search": ["index_dir", "queries"],
    "check": ["index_dir"],
}


def load_config(path: str) -> dict:
    """Read a JSON job config and substitute ``${name}`` placeholders
    from its ``vars`` section into every string value (recursively).
    Unknown placeholders are left intact and caught by validation."""
    with open(path) as f:
        cfg = json.load(f)
    variables = cfg.get("vars", {})

    def subst(v):
        if isinstance(v, str):
            for k, val in variables.items():
                v = v.replace("${%s}" % k, str(val))
            return v
        if isinstance(v, dict):
            return {k: subst(x) for k, x in v.items()}
        if isinstance(v, list):
            return [subst(x) for x in v]
        return v

    return {k: subst(v) for k, v in cfg.items() if k != "vars"}


def resolve_args(cmd: str, cli: dict, config: dict | None) -> dict:
    """Precedence: explicit CLI flag > config-file section > default.
    Raises on missing required settings and unresolved placeholders."""
    section = (config or {}).get(cmd, {})
    out = dict(DEFAULTS[cmd])
    for k, v in section.items():
        out[k] = v
    for k, v in cli.items():
        if v is not None:
            out[k] = v
    for k in REQUIRED[cmd]:
        if out.get(k) in (None, ""):
            raise SystemExit(f"{cmd}: missing required setting {k!r} (flag or config)")
        if isinstance(out[k], str) and "${" in out[k]:
            raise SystemExit(f"{cmd}: unresolved placeholder in {k}={out[k]!r}")
    return out


def parse_queries(spec: str) -> list[tuple[int, str, int]]:
    queries = []
    for part in spec.split(";"):
        # id : text : k — text may itself contain ':'
        qid, rest = part.split(":", 1)
        text, k = rest.rsplit(":", 1)
        queries.append((int(qid), text, int(k)))
    return queries


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--config", default=None, help="JSON job config with ${var} substitution")
    b.add_argument("--corpus", default=None, help="parquet path or Iceberg table")
    b.add_argument("--index-dir", dest="index_dir", default=None)
    b.add_argument("--partitions", type=int, default=None)
    b.add_argument("--id-col", dest="id_col", default=None)

    s = sub.add_parser("search")
    s.add_argument("--config", default=None, help="JSON job config with ${var} substitution")
    s.add_argument("--index-dir", dest="index_dir", default=None)
    s.add_argument("--queries", default=None, help="semicolon-separated id:text:k")
    s.add_argument("--mode", default=None, choices=[None, "disjunctive", "conjunctive"])
    s.add_argument(
        "--engine", default=None,
        choices=[None, "dataframe", "wand", "auto", "syntax", "boolean"],
        help="dataframe | wand kernel | auto (cost-based route) "
             "| syntax (+/-/phrase/field:/term*/term~) | boolean (AND/OR/parens)",
    )
    c = sub.add_parser("check")
    c.add_argument("--config", default=None, help="JSON job config with ${var} substitution")
    c.add_argument("--index-dir", dest="index_dir", default=None)
    c.add_argument("--deep", action="store_true", default=None,
                   help="also decode every posting block (CheckIndex thorough mode)")

    args = ap.parse_args()

    config = load_config(args.config) if args.config else None
    cli = {k: v for k, v in vars(args).items() if k not in ("cmd", "config")}
    opts = resolve_args(args.cmd, cli, config)

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
        cfg = IndexConfig(build_partitions=int(opts["partitions"]))
        corpus = load_corpus(spark, opts["corpus"])
        if opts["id_col"]:
            corpus = spark.read.parquet(opts["corpus"])  # keep the id column
        t0 = time.time()
        idx = build_index(spark, corpus, cfg, opts["index_dir"], id_col=opts["id_col"])
        sec = time.time() - t0
        out = {
            "cmd": "build",
            "finalized": idx is not None,
            "n_docs": idx.n_docs if idx else None,
            "seconds": round(sec, 3),
            "files_per_sec": round(idx.n_docs / sec, 1) if idx and sec > 0 else None,
        }
    elif args.cmd == "check":
        # the on-disk invariant validator — CheckIndex analog run via
        # spark-submit, mirroring Lucene's `java ... CheckIndex <dir>`
        from org_rdkit_lucene_spark.operators.check import (
            check_index,
            check_segmented,
        )
        from org_rdkit_lucene_spark.streaming.incremental import (
            SegmentedIndex,
            list_segments,
        )

        t0 = time.time()
        # an index with delta segments gets the per-segment walk
        # (Lucene CheckIndex's segment loop); a monolithic one the
        # plain pass
        if list_segments(opts["index_dir"]):
            rep = check_segmented(
                SegmentedIndex.load(spark, opts["index_dir"]),
                deep=bool(opts["deep"]),
            )
        else:
            idx = InvertedIndex.load(spark, opts["index_dir"])
            rep = check_index(idx, deep=bool(opts["deep"]))
        out = {
            "cmd": "check",
            "index_dir": opts["index_dir"],
            "deep": bool(opts["deep"]),
            "passed": bool(rep["passed"].all()),
            "seconds": round(time.time() - t0, 3),
            "checks": {r.check: bool(r.passed) for r in rep.itertuples()},
            "details": {r.check: r.detail for r in rep.itertuples() if not r.passed},
        }
    else:
        from org_rdkit_lucene_spark.operators.query import search_boolean, search_syntax

        idx = InvertedIndex.load(spark, opts["index_dir"])
        queries = parse_queries(opts["queries"])
        t0 = time.time()
        if opts["engine"] == "syntax":
            # phrase clauses need the stored bodies; plain +/-/field:/
            # term*/term~ clauses do not
            res = search_syntax(idx, None, queries)
        elif opts["engine"] == "boolean":
            res = search_boolean(idx, queries)
        elif opts["engine"] == "auto":
            from org_rdkit_lucene_spark.operators.query import search_auto

            res = search_auto(idx, queries, mode=opts["mode"])
        else:
            fn = search_wand if opts["engine"] == "wand" else search
            res = fn(idx, queries, mode=opts["mode"])
        rows = res.collect()
        out = {
            "cmd": "search",
            "engine": opts["engine"],
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
