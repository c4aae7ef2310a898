"""S8 config source (file-based settings + ${var} placeholder
substitution, LuceneBenchmark.java:716-743 analog) and the S6 bench
results CSV format (per-query rows, LuceneBenchmark.java:79-84,435-500
analog)."""

import json
import sys

import pytest

sys.path.insert(0, "/root/repo")
from scripts.job import load_config, parse_queries, resolve_args


def _write(tmp_path, cfg):
    p = tmp_path / "job.json"
    p.write_text(json.dumps(cfg))
    return str(p)


def test_config_placeholder_substitution(tmp_path):
    p = _write(tmp_path, {
        "vars": {"root": "/data/run1", "p": 8},
        "build": {"corpus": "${root}/corpus.parquet", "index_dir": "${root}/idx",
                  "partitions": "${p}"},
    })
    cfg = load_config(p)
    assert cfg["build"]["corpus"] == "/data/run1/corpus.parquet"
    assert cfg["build"]["partitions"] == "8"
    assert "vars" not in cfg


def test_resolve_precedence_cli_over_config_over_default(tmp_path):
    cfg = load_config(_write(tmp_path, {
        "build": {"corpus": "/c.parquet", "index_dir": "/idx", "partitions": 16},
    }))
    # config supplies everything; default partitions overridden by config
    out = resolve_args("build", {"corpus": None, "index_dir": None,
                                 "partitions": None, "id_col": None}, cfg)
    assert out == {"corpus": "/c.parquet", "index_dir": "/idx",
                   "partitions": 16, "id_col": None}
    # explicit CLI wins over config
    out = resolve_args("build", {"corpus": "/other.parquet", "index_dir": None,
                                 "partitions": 4, "id_col": None}, cfg)
    assert out["corpus"] == "/other.parquet"
    assert out["partitions"] == 4


def test_resolve_defaults_without_config():
    out = resolve_args("search", {"index_dir": "/idx", "queries": "1:a:5",
                                  "mode": None, "engine": None}, None)
    assert out["mode"] == "disjunctive"
    assert out["engine"] == "dataframe"


def test_resolve_missing_required():
    with pytest.raises(SystemExit, match="missing required"):
        resolve_args("build", {"corpus": None, "index_dir": "/idx",
                               "partitions": None, "id_col": None}, None)


def test_resolve_unresolved_placeholder(tmp_path):
    cfg = load_config(_write(tmp_path, {
        "build": {"corpus": "${nope}/c.parquet", "index_dir": "/idx"},
    }))
    with pytest.raises(SystemExit, match="unresolved placeholder"):
        resolve_args("build", {"corpus": None, "index_dir": None,
                               "partitions": None, "id_col": None}, cfg)


def test_parse_queries_with_colons_in_text():
    qs = parse_queries("1:std::vector push:5;2:plain terms:3")
    assert qs == [(1, "std::vector push", 5), (2, "plain terms", 3)]


def test_bench_results_csv_format(tmp_path):
    from bench import RESULTS_CSV_HEADER, write_results_csv

    rows = [
        (8, "q_disjunctive", "disjunctive", 0, 123.4, 200),
        (8, "q_disjunctive", "disjunctive", 1, 110.0, 200),
        (2, "q_topk_large_wand", "wand_large_k", 0, 999.9, 50000),
    ]
    path = str(tmp_path / "BENCH" / "results.csv")
    write_results_csv(rows, path)
    lines = open(path).read().strip().splitlines()
    assert lines[0] == RESULTS_CSV_HEADER == "level_cores,query,type,repeat,wall_ms,hits"
    assert lines[1] == "8,q_disjunctive,disjunctive,0,123.4,200"
    assert len(lines) == 4
