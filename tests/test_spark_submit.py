"""The spark-submit --py-files contract (north_star: "runs via
spark-submit --py-files on multi-executor clusters"): package the
engine as a zip, submit build + search jobs as a REAL spark-submit
subprocess (package imported only from the zip), check results match
an in-process build."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    if os.path.exists(cand):
        return cand
    pytest.skip("spark-submit not available")


@pytest.fixture(scope="module")
def submitted(tmp_path_factory):
    from org_rdkit_lucene_spark.sources.fixtures import make_corpus_pdf
    from scripts.make_pyfiles import build as build_zip

    tmp = tmp_path_factory.mktemp("submit")
    corpus_path = str(tmp / "corpus.parquet")
    make_corpus_pdf(n_docs=120, seed=11).to_parquet(corpus_path, index=False)
    zip_path = build_zip(str(tmp / "orls.zip"))

    env = dict(os.environ)
    # the zip must be the ONLY import source for the package
    env["PYTHONPATH"] = ""
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    idx_dir = str(tmp / "idx")
    common = [
        _spark_submit(), "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--py-files", zip_path,
    ]
    job = os.path.join(REPO, "scripts", "job.py")

    r1 = subprocess.run(
        common + [job, "build", "--corpus", corpus_path, "--index-dir", idx_dir,
                  "--partitions", "4"],
        capture_output=True, text=True, timeout=420, env=env, cwd=str(tmp),
    )
    assert r1.returncode == 0, r1.stderr[-3000:]
    build_out = json.loads(r1.stdout.strip().splitlines()[-1])

    # S8 config-file source: same search driven by a JSON config with
    # ${var} placeholder substitution instead of CLI flags
    cfg_path = str(tmp / "job.json")
    with open(cfg_path, "w") as f:
        json.dump({
            "vars": {"idx": idx_dir},
            "search": {"index_dir": "${idx}",
                       "queries": "1:getIndexValue merg scorer:5;2:token hash:3",
                       "engine": "wand"},
        }, f)
    r2 = subprocess.run(
        common + [job, "search", "--config", cfg_path],
        capture_output=True, text=True, timeout=420, env=env, cwd=str(tmp),
    )
    assert r2.returncode == 0, r2.stderr[-3000:]
    search_out = json.loads(r2.stdout.strip().splitlines()[-1])

    # the boolean engine through the same submitted surface
    r3 = subprocess.run(
        common + [job, "search", "--index-dir", idx_dir, "--engine", "boolean",
                  "--queries", "1:(merg AND token) OR get:5"],
        capture_output=True, text=True, timeout=420, env=env, cwd=str(tmp),
    )
    assert r3.returncode == 0, r3.stderr[-3000:]
    bool_out = json.loads(r3.stdout.strip().splitlines()[-1])

    # CheckIndex analog through the same submitted surface
    r4 = subprocess.run(
        common + [job, "check", "--index-dir", idx_dir, "--deep"],
        capture_output=True, text=True, timeout=420, env=env, cwd=str(tmp),
    )
    assert r4.returncode == 0, r4.stderr[-3000:]
    check_out = json.loads(r4.stdout.strip().splitlines()[-1])
    return {"build": build_out, "search": search_out, "boolean": bool_out,
            "check": check_out, "corpus": corpus_path}


def test_submit_build_finalizes(submitted):
    assert submitted["build"]["finalized"]
    assert submitted["build"]["n_docs"] == 122  # 120 + 2% near-dups


def test_submit_search_matches_inprocess(spark, submitted, tmp_path):
    """The spark-submit WAND result must equal an in-process build+search
    over the same corpus — same ids, ranks, and quantized scores."""
    from org_rdkit_lucene_spark.config import IndexConfig
    from org_rdkit_lucene_spark.operators.build import build_index
    from org_rdkit_lucene_spark.operators.query import search

    corpus = spark.read.parquet(submitted["corpus"])
    idx = build_index(spark, corpus, IndexConfig(build_partitions=4), str(tmp_path / "i"))
    want = search(
        idx, [(1, "getIndexValue merg scorer", 5), (2, "token hash", 3)]
    ).toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    got = submitted["search"]["results"]
    assert [
        (r["query_id"], r["rank"], r["doc_id"], r["score_q"]) for r in got
    ] == list(map(tuple, want[["query_id", "rank", "doc_id", "score_q"]].to_numpy()))


def test_submit_boolean_matches_inprocess(spark, submitted, tmp_path):
    from org_rdkit_lucene_spark.config import IndexConfig
    from org_rdkit_lucene_spark.operators.build import build_index
    from org_rdkit_lucene_spark.operators.query import search_boolean

    corpus = spark.read.parquet(submitted["corpus"])
    idx = build_index(spark, corpus, IndexConfig(build_partitions=4), str(tmp_path / "ib"))
    want = search_boolean(
        idx, [(1, "(merg AND token) OR get", 5)]
    ).toPandas().sort_values("rank").reset_index(drop=True)
    got = submitted["boolean"]["results"]
    assert [
        (r["query_id"], r["rank"], r["doc_id"], r["score_q"]) for r in got
    ] == list(map(tuple, want[["query_id", "rank", "doc_id", "score_q"]].to_numpy()))


def test_submit_check_passes(submitted):
    """spark-submit job.py check --deep: every invariant green on the
    just-built index (Lucene's `java ... CheckIndex <dir>` analog)."""
    rep = submitted["check"]
    assert rep["deep"] and rep["passed"], rep
    assert "deep_cf_matches" in rep["checks"]
    assert rep["details"] == {}
