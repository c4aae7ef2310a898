"""DuckDB SQL generators mirroring the engine's query semantics.

Used by ``__spark_entry__.oracle_sql()``: for each engine query the
driver runs this SQL on the same parquet tables and compares row
counts, schemas, and value hashes. The SQL reimplements the engine's
EXACT semantics — same tokenizer (via :func:`duckdb_tokens_sql`), same
BM25 (k1=1.2, b=0.75, idf = ln(1+(N-df+0.5)/(df+0.5)), avgdl over all
docs), same score quantization (floor(score*10^4+0.5) as BIGINT), same
tie-break (score_q DESC, doc_id ASC — SubstructureHitQueue.java:113-118).
"""

from __future__ import annotations

from org_rdkit_lucene_spark.config import BM25Params, candidate_cap
from org_rdkit_lucene_spark.functions.tokenizer import duckdb_tokens_sql, tokenize_text

P = BM25Params()
_QUANT = 10**P.score_decimals


def _values_qterms(queries: list[tuple[int, str, int]]) -> str:
    """(query_id, term, qtf, n_terms, k) VALUES rows from the canonical
    tokenizer — the oracle consumes pre-tokenized queries exactly like
    the engine's driver-side query tokenization."""
    rows = []
    for qid, text, k in queries:
        toks = tokenize_text(text)
        if not toks:
            continue
        counts: dict[str, int] = {}
        for t in toks:
            counts[t] = counts.get(t, 0) + 1
        for term, qtf in counts.items():
            esc = term.replace("'", "''")
            rows.append(f"({qid}, '{esc}', {qtf}, {len(counts)}, {k})")
    if not rows:
        rows = ["(NULL, NULL, NULL, NULL, NULL)"]
    return ",\n    ".join(rows)


def _bm25_ctes(queries: list[tuple[int, str, int]], table: str = "documents") -> str:
    toks = duckdb_tokens_sql("text")
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({toks}) AS term FROM {table}
),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY 1),
nstat AS (SELECT count(*)::DOUBLE AS n FROM {table}),
dlstat AS (
  SELECT sum(coalesce(dl.dl, 0)) / (SELECT n FROM nstat) AS avgdl
  FROM {table} LEFT JOIN dl USING (doc_id)
),
dfs AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
q(query_id, term, qtf, n_terms, k) AS (
  VALUES
    {_values_qterms(queries)}
),
scored AS (
  SELECT q.query_id, tf.doc_id,
         sum(q.qtf * ln(1.0 + ((SELECT n FROM nstat) - dfs.df + 0.5) / (dfs.df + 0.5))
             * tf.tf * {P.k1 + 1.0}
             / (tf.tf + {P.k1} * (1.0 - {P.b} + {P.b} * dl.dl / (SELECT avgdl FROM dlstat)))
         ) AS score_raw,
         count(*) AS n_matched,
         max(q.n_terms) AS n_terms,
         max(q.k) AS k
  FROM tf
  JOIN q USING (term)
  JOIN dfs USING (term)
  JOIN dl USING (doc_id)
  GROUP BY 1, 2
)"""


def _ranked(conjunctive: bool) -> str:
    flt = "WHERE n_matched = n_terms" if conjunctive else ""
    return f""",
ranked AS (
  SELECT query_id, doc_id,
         CAST(floor(score_raw * {_QUANT} + 0.5) AS BIGINT) AS score_q, k,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY CAST(floor(score_raw * {_QUANT} + 0.5) AS BIGINT) DESC, doc_id ASC
         ) AS rnk
  FROM scored {flt}
)"""


def bm25_topk_sql(queries: list[tuple[int, str, int]], mode: str = "disjunctive") -> str:
    conj = mode == "conjunctive"
    return (
        _bm25_ctes(queries)
        + _ranked(conj)
        + """
SELECT CAST(query_id AS INTEGER) AS query_id, CAST(rnk AS INTEGER) AS rank,
       CAST(doc_id AS BIGINT) AS doc_id, score_q
FROM ranked WHERE rnk <= k
ORDER BY query_id, rank"""
    )


def hit_counts_sql(queries: list[tuple[int, str, int]], mode: str = "disjunctive") -> str:
    flt = "WHERE n_matched = n_terms" if mode == "conjunctive" else ""
    return (
        _bm25_ctes(queries)
        + f"""
SELECT CAST(query_id AS INTEGER) AS query_id, count(*)::BIGINT AS total_hits
FROM scored {flt}
GROUP BY 1 ORDER BY 1"""
    )


def two_phase_sql(queries: list[tuple[int, str, int]]) -> str:
    """Q6 analog: conjunctive candidates capped at min(10k, 1e5), verify
    raw query text as substring of the stored body, keep phase-A score,
    re-rank to k (ChemicalIndex.java:657-727)."""
    capped = [(qid, text, candidate_cap(k)) for qid, text, k in queries]
    qtext_rows = ",\n    ".join(
        "({}, '{}', {})".format(qid, text.replace("'", "''"), k) for qid, text, k in queries
    )
    return (
        _bm25_ctes(capped)
        + _ranked(True)
        + f""",
qtext(query_id, qtext, final_k) AS (
  VALUES
    {qtext_rows}
),
verified AS (
  SELECT r.query_id, r.doc_id, r.score_q, qt.final_k,
         row_number() OVER (
           PARTITION BY r.query_id ORDER BY r.score_q DESC, r.doc_id ASC
         ) AS rnk2
  FROM ranked r
  JOIN qtext qt USING (query_id)
  JOIN documents d ON d.doc_id = r.doc_id
  WHERE r.rnk <= r.k AND contains(d.text, qt.qtext)
)
SELECT CAST(query_id AS INTEGER) AS query_id, CAST(rnk2 AS INTEGER) AS rank,
       CAST(doc_id AS BIGINT) AS doc_id, score_q
FROM verified WHERE rnk2 <= final_k
ORDER BY query_id, rank"""
    )


def lexicon_sql(limit: int = 30) -> str:
    """Top terms by document frequency — checks the whole SPIMI+merge
    +lexicon pipeline against a direct SQL tokenization."""
    toks = duckdb_tokens_sql("text")
    return f"""
WITH tok AS (SELECT doc_id, unnest({toks}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2)
SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf
FROM tf GROUP BY term
ORDER BY df DESC, term ASC LIMIT {limit}"""


def docmeta_sql() -> str:
    """doc_len + sha256 invariant vs a direct SQL computation."""
    toks = duckdb_tokens_sql("text")
    return f"""
SELECT doc_id::BIGINT AS doc_id,
       len({toks})::BIGINT AS doc_len,
       sha256(text) AS sha256
FROM documents ORDER BY doc_id"""


def point_lookup_sql(doc_id: int) -> str:
    return f"""
SELECT doc_id::BIGINT AS doc_id, lang, sha256(text) AS sha256
FROM documents WHERE doc_id = {doc_id}"""


def exact_match_sql(anchor_doc_id: int) -> str:
    """Q4 analog: all docs whose body hash equals the anchor doc's."""
    return f"""
SELECT doc_id::BIGINT AS doc_id, sha256(text) AS sha256
FROM documents
WHERE sha256(text) = (SELECT sha256(text) FROM documents WHERE doc_id = {anchor_doc_id})
ORDER BY doc_id"""


def blocklist_sql(blocked: list[int]) -> str:
    """P2 analog (setIgnorePKs, ChemicalIndex.java:258): anti-join."""
    ids = ", ".join(str(i) for i in blocked)
    return f"""
SELECT doc_id::BIGINT AS doc_id FROM documents
WHERE doc_id NOT IN ({ids}) ORDER BY doc_id"""
