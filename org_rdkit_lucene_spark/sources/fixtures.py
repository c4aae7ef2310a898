"""Deterministic synthetic source-code corpus + query set.

Analog of the reference's test surface: an indexable record corpus
(ChEMBL SDF input, ``/root/reference/README.txt:38-42``) and a line-file
query set (``querySmilesFile``, ``LuceneBenchmark.java:271-288``) —
synthesized locally, seeded, no external data (FIXTURES.md §1-2).

Corpus shape is exactly BASELINE.json's ``input_hint``:
``(repo, path, commit, lang, content)``, all strings. Content is
code-like text with camelCase/snake_case/UPPER_CASE identifiers, Zipf
term skew, engineered hot terms (>30% of docs — exercises the salted
merge), and a block of near-duplicate docs (exercises tie-breaking).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

LANGS = ["py", "java", "scala", "js", "go", "rs", "sql"]
_LANG_W = np.array([0.30, 0.20, 0.10, 0.15, 0.10, 0.08, 0.07])
_EXT = dict(zip(LANGS, ["py", "java", "scala", "js", "go", "rs", "sql"]))

_KEYWORDS = {
    "py": ["def", "return", "import", "class", "self", "None", "lambda"],
    "java": ["public", "static", "void", "class", "extends", "return", "new"],
    "scala": ["val", "def", "object", "case", "match", "implicit"],
    "js": ["function", "const", "let", "return", "async", "await"],
    "go": ["func", "package", "return", "defer", "struct", "interface"],
    "rs": ["fn", "let", "mut", "impl", "match", "pub", "crate"],
    "sql": ["select", "from", "where", "group", "order", "join"],
}

# Hot terms appear in >30% of docs (FIXTURES.md): exercises salted merge.
HOT_TERMS = ["get", "index", "main", "value", "data"]

_ROOTS = [
    "pars", "token", "merg", "scor", "post", "lex", "shard", "batch", "fetch",
    "cach", "hash", "rank", "quer", "build", "flush", "split", "encod",
    "decod", "stream", "block", "chunk", "node", "graph", "tree", "heap",
    "queue", "stack", "buffer", "cursor", "handle", "widget", "config",
    "metric", "logger", "worker", "driver", "executor", "planner", "filter",
]
_SUFFIXES = ["er", "or", "ing", "ed", "Factory", "Manager", "Impl", "Util", "Helper"]
_MODULES = ["core", "util", "io", "net", "index", "query", "codec", "bench", "api"]


def _make_vocab(rng: np.random.Generator, size: int = 2000) -> list[str]:
    vocab: list[str] = []
    styles = rng.integers(0, 3, size=size)
    r1 = rng.integers(0, len(_ROOTS), size=size)
    r2 = rng.integers(0, len(_ROOTS), size=size)
    sfx = rng.integers(0, len(_SUFFIXES), size=size)
    num = rng.integers(0, 100, size=size)
    for i in range(size):
        a, b, s = _ROOTS[r1[i]], _ROOTS[r2[i]], _SUFFIXES[sfx[i]]
        if styles[i] == 0:  # camelCase
            ident = f"{a}{b.capitalize()}{s.capitalize()}"
        elif styles[i] == 1:  # snake_case
            ident = f"{a}_{b}_{s.lower()}"
        else:  # UPPER + digit
            ident = f"{a.upper()}_{b.upper()}{num[i]}"
        vocab.append(ident)
    return vocab


def _make_doc(i: int, seed: int, vocab: list[str], w: np.ndarray) -> tuple:
    """One corpus row from a per-doc rng — deterministic regardless of
    generation order/chunking (parallel-safe)."""
    rng = np.random.default_rng((seed, i))
    v = len(vocab)
    lang = LANGS[int(rng.choice(len(LANGS), p=_LANG_W))]
    n_lines = int(rng.integers(20, 401))
    kw = _KEYWORDS[lang]
    idents = rng.choice(v, size=n_lines * 3, p=w)
    hot_mask = rng.random(n_lines) < 0.35
    lines = []
    for ln in range(n_lines):
        a, b, c = (vocab[int(x)] for x in idents[ln * 3 : ln * 3 + 3])
        k = kw[ln % len(kw)]
        hot = f" {HOT_TERMS[ln % len(HOT_TERMS)]}" if hot_mask[ln] else ""
        if ln % 7 == 0:
            lines.append(f"# {a} returns the {b} for{hot} {c}")
        elif ln % 7 == 3:
            lines.append(f'{k} {a} = "{b}:{c}"{hot}')
        else:
            lines.append(f"{k} {a}({b}, {c}){hot} {{")
    content = "\n".join(lines)
    repo = f"org{i % 7}/repo{i % 53}"
    path = f"src/{_MODULES[i % len(_MODULES)]}/{vocab[int(idents[0])].lower()}_{i}.{_EXT[lang]}"
    commit = hashlib.sha1(f"{repo}|{path}|{seed}".encode()).hexdigest()[:12]
    return (repo, path, commit, lang, content)


def _make_doc_range(args: tuple) -> list[tuple]:
    lo, hi, seed = args
    rng = np.random.default_rng(seed)
    vocab = _make_vocab(rng)
    w = 1.0 / np.power(np.arange(1, len(vocab) + 1), 1.1)
    w /= w.sum()
    return [_make_doc(i, seed, vocab, w) for i in range(lo, hi)]


def make_corpus_pdf(
    n_docs: int = 5000, seed: int = 42, near_dup_frac: float = 0.02, workers: int = 1
) -> pd.DataFrame:
    """Build the docs table as a pandas DataFrame (deterministic; the
    per-doc rng makes output independent of ``workers``)."""
    if workers > 1 and n_docs >= 4000:
        from multiprocessing import Pool

        step = (n_docs + workers - 1) // workers
        chunks = [(lo, min(lo + step, n_docs), seed) for lo in range(0, n_docs, step)]
        with Pool(workers) as pool:
            rows = [r for part in pool.map(_make_doc_range, chunks) for r in part]
    else:
        rows = _make_doc_range((0, n_docs, seed))

    # near-duplicates: clone earlier docs with a one-line tweak
    n_dup = int(n_docs * near_dup_frac)
    for j in range(n_dup):
        src = rows[j * 3 % n_docs]
        repo = f"org{(j + 3) % 7}/repo{(j + 11) % 53}"
        path = f"src/dup/clone_{j}.{src[3]}"
        commit = hashlib.sha1(f"{repo}|{path}|{seed}".encode()).hexdigest()[:12]
        content = src[4] + f"\n# clone {j}"
        rows.append((repo, path, commit, src[3], content))

    pdf = pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])
    # primary key must be unique (upsert law, ChemicalIndex.java:801)
    assert not pdf.duplicated(["repo", "path", "commit"]).any()
    return pdf


def make_query_set(seed: int = 42) -> pd.DataFrame:
    """~60 queries: 40 disjunctive / 10 conjunctive / 10 phrase_verify
    (FIXTURES.md §2), mixing hot terms, rare identifiers, camelCase
    (tests splitting) and one absent term (zero-hit case)."""
    rng = np.random.default_rng(seed + 1)
    vocab = _make_vocab(np.random.default_rng(seed))
    queries: list[tuple[int, str, str, int]] = []
    qid = 1

    def add(qtype: str, text: str, k: int = 10):
        nonlocal qid
        queries.append((qid, qtype, text, k))
        qid += 1

    for i in range(40):
        n_terms = int(rng.integers(1, 7))
        parts = []
        for t in range(n_terms):
            r = rng.random()
            if r < 0.3:
                parts.append(HOT_TERMS[int(rng.integers(0, len(HOT_TERMS)))])
            else:
                parts.append(vocab[int(rng.integers(0, len(vocab)))])
        add("disjunctive", " ".join(parts))
    # special ks
    queries[0] = (1, "disjunctive", queries[0][2], 1)      # k=1 (PK-lookup analog)
    queries[1] = (2, "disjunctive", queries[1][2], 1000)   # k=1000
    queries[4] = (5, "disjunctive", "zzzunseenterm999", 10)  # zero-hit

    for i in range(10):
        parts = [vocab[int(rng.integers(0, 200))] for _ in range(int(rng.integers(1, 4)))]
        add("conjunctive", " ".join(parts))
    for i in range(10):
        add("phrase_verify", vocab[int(rng.integers(0, 400))])
    return pd.DataFrame(queries, columns=["query_id", "query_type", "text", "k"])


def write_corpus_parquet(path: str, n_docs: int = 5000, seed: int = 42) -> str:
    make_corpus_pdf(n_docs, seed).to_parquet(path, index=False)
    return path
