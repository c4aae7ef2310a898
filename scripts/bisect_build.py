#!/usr/bin/env python
"""Interleaved A/B bisect of the round-4 build-throughput regression.

VERDICT r4 #1: build 4,409 -> 2,900 files/s between r3 and r4. The only
build-path code changes are trivial (write.lock = one file create,
n_null sum folded into the existing PK aggregation, Arrow-input
tokenizer overloads on identical kernels); the bench CONFIG changed:
``build_partitions`` went from ``max(cores,8)`` (=8 at the 4N level) to
``max(cores*4,8)`` (=32, "wave smoothing").  This script alternates
A(parts=8) / B(parts=32) builds in ONE JVM on the same 204k corpus so
box drift can't masquerade as a config effect.  Optionally a third arm
C(parts=32, lock disabled) isolates the lock.

Usage: python scripts/bisect_build.py [pairs] [--with-lock-arm]
Appends all samples to BENCH/results.csv-style stdout lines + a JSON
summary line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from org_rdkit_lucene_spark.config import IndexConfig
from org_rdkit_lucene_spark.operators.build import build_index
from org_rdkit_lucene_spark.session import get_spark

import bench  # noqa: E402  (repo-root bench harness: corpus cache)


def main() -> None:
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 3
    lock_arm = "--with-lock-arm" in sys.argv
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    cores = max(4, cpus // 4)  # the 4N bench level
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    n_docs_target = min(200_000, int(2_000_000 * sf))
    corpus_path = bench._bench_corpus_path(n_docs_target)
    pilot_path = bench._bench_corpus_path(4_000)

    spark = get_spark("bisect_build", cores=cores, shuffle_partitions=max(cores, 8))
    corpus = spark.read.parquet(corpus_path)
    n_docs = corpus.count()

    arms = {
        "A_parts8": IndexConfig(build_partitions=max(cores, 8), n_salts=8),
        "B_parts32": IndexConfig(build_partitions=max(cores * 4, 8), n_salts=8),
    }
    if lock_arm:
        arms["C_parts32_nolock"] = IndexConfig(
            build_partitions=max(cores * 4, 8), n_salts=8
        )

    # pilot warm-up, excluded (JIT + python-worker spawn)
    pd_dir = tempfile.mkdtemp(prefix="bisect_pilot_")
    pilot = spark.read.parquet(pilot_path)
    build_index(spark, pilot, arms["B_parts32"], pd_dir, validate_pk=False, id_col="ext_id")
    shutil.rmtree(pd_dir, ignore_errors=True)

    samples: dict[str, list[float]] = {k: [] for k in arms}
    for i in range(pairs):
        for name, cfg in arms.items():
            idx_dir = tempfile.mkdtemp(prefix=f"bisect_{name}_")
            t0 = time.time()
            build_index(spark, corpus, cfg, idx_dir, validate_pk=False, id_col="ext_id")
            dt = time.time() - t0
            samples[name].append(round(dt, 2))
            print(
                f"pair={i} arm={name} parts={cfg.build_partitions} "
                f"wall={dt:.2f}s files/s={n_docs / dt:.0f}",
                flush=True,
            )
            shutil.rmtree(idx_dir, ignore_errors=True)

    summary = {
        "n_docs": n_docs,
        "cores": cores,
        "samples_sec": samples,
        "best_files_per_sec": {
            k: round(n_docs / min(v), 1) for k, v in samples.items()
        },
        "median_sec": {k: sorted(v)[len(v) // 2] for k, v in samples.items()},
    }
    print("BISECT_SUMMARY " + json.dumps(summary), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
