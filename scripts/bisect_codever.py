#!/usr/bin/env python
"""Second bisect axis: r3-vintage CODE vs current code, interleaved.

Each sample is a fresh subprocess (own JVM) whose PYTHONPATH points at
either the round-3 worktree or the current repo; both build the SAME
cached 204k corpus with the r3 bench config (build_partitions=8,
n_salts=8) after a pilot warm-up. If r3 code lands at the same wall as
current code today, the r4 "regression" is environmental (box drift),
not a code or config change.

Usage: python scripts/bisect_codever.py [pairs] [r3_tree]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import bench  # corpus cache helper

CHILD = r"""
import os, shutil, sys, tempfile, time
sys.path.insert(0, os.environ["ORLS_TREE"])
from org_rdkit_lucene_spark.config import IndexConfig
from org_rdkit_lucene_spark.operators.build import build_index
from org_rdkit_lucene_spark.session import get_spark

cores = int(os.environ["ORLS_CORES"])
spark = get_spark("bisect_ver", cores=cores, shuffle_partitions=max(cores, 8))
corpus = spark.read.parquet(os.environ["ORLS_CORPUS"])
cfg = IndexConfig(build_partitions=max(cores, 8), n_salts=8)
pd_dir = tempfile.mkdtemp(prefix="bv_pilot_")
pilot = spark.read.parquet(os.environ["ORLS_PILOT"])
build_index(spark, pilot, cfg, pd_dir, validate_pk=False, id_col="ext_id")
shutil.rmtree(pd_dir, ignore_errors=True)
idx_dir = tempfile.mkdtemp(prefix="bv_idx_")
t0 = time.time()
build_index(spark, corpus, cfg, idx_dir, validate_pk=False, id_col="ext_id")
print("WALL_SEC", round(time.time() - t0, 2), flush=True)
shutil.rmtree(idx_dir, ignore_errors=True)
spark.stop()
"""


def main() -> None:
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 3
    r3_tree = sys.argv[2] if len(sys.argv) > 2 else "/tmp/r3tree"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    cores = max(4, cpus // 4)
    corpus = bench._bench_corpus_path(min(200_000, 200_000))
    pilot = bench._bench_corpus_path(4_000)

    samples: dict[str, list[float]] = {"r3_code": [], "current": []}
    trees = {"r3_code": r3_tree, "current": REPO}
    for i in range(pairs):
        for name, tree in trees.items():
            env = dict(
                os.environ,
                ORLS_TREE=tree,
                ORLS_CORES=str(cores),
                ORLS_CORPUS=corpus,
                ORLS_PILOT=pilot,
            )
            r = subprocess.run(
                [sys.executable, "-c", CHILD], env=env, capture_output=True, text=True
            )
            wall = None
            for line in r.stdout.splitlines():
                if line.startswith("WALL_SEC"):
                    wall = float(line.split()[1])
            if wall is None:
                print(f"pair={i} arm={name} FAILED\n{r.stderr[-2000:]}", flush=True)
                continue
            samples[name].append(wall)
            print(f"pair={i} arm={name} wall={wall}s", flush=True)
    print(
        "CODEVER_SUMMARY "
        + json.dumps(
            {
                "cores": cores,
                "samples_sec": samples,
                "median_sec": {
                    k: sorted(v)[len(v) // 2] if v else None
                    for k, v in samples.items()
                },
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
