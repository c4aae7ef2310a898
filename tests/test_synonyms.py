"""SynonymQuery law (operators/query.py::search_synonyms): the
engine's synonym-group BM25 must be rank- and quantized-score-identical
to a brute-force oracle computing tf_group = Σ member tf and
df_group = max member df; with an empty synonym map it must collapse
to the plain search exactly."""

import math

import pandas as pd
import pytest

from org_rdkit_lucene_spark.functions.tokenizer import tokenize_text
from org_rdkit_lucene_spark.operators.query import search, search_synonyms

QUERIES = [
    (1, "merge scorer", 10),
    (2, "hash window", 8),
    (3, "zzzmissing merge", 10),
]
# raw-form map: keys and alts are analyzed by the engine
SYNONYMS = {"merge": ["join", "combine"], "hash": ["digest"]}


@pytest.fixture(scope="module")
def corpus_stats(small_index, small_pdf):
    docmap = small_index.docmap.toPandas()
    src = small_pdf.merge(docmap, on=["repo", "path", "commit"])
    docs = {}
    for r in src.itertuples():
        toks = tokenize_text(r.content)
        counts: dict[str, int] = {}
        for t in toks:
            counts[t] = counts.get(t, 0) + 1
        docs[int(r.doc_id)] = (counts, len(toks))
    n = len(docs)
    total = sum(dl for _, dl in docs.values())
    df: dict[str, int] = {}
    for counts, _ in docs.values():
        for t in counts:
            df[t] = df.get(t, 0) + 1
    return {"docs": docs, "n": n, "avgdl": total / n, "df": df}


def _group_members(term, syn_norm):
    return list(dict.fromkeys([term, *syn_norm.get(term, [])]))


def _brute(stats, queries, synonyms, mode):
    syn_norm = {
        tokenize_text(k)[0]: [tokenize_text(a)[0] for a in alts]
        for k, alts in synonyms.items()
    }
    k1, b = 1.2, 0.75
    n, avgdl = float(stats["n"]), stats["avgdl"]
    parts = []
    for qid, text, k in queries:
        toks = tokenize_text(text)
        qtf: dict[str, int] = {}
        for t in toks:
            qtf[t] = qtf.get(t, 0) + 1
        n_groups = len(qtf)
        rows = []
        for doc_id, (counts, dl) in stats["docs"].items():
            s, matched = 0.0, 0
            for term, q in qtf.items():
                mem = _group_members(term, syn_norm)
                gtf = sum(counts.get(m, 0) for m in mem)
                gdf = max((stats["df"].get(m, 0) for m in mem), default=0)
                if gtf == 0 or gdf == 0:
                    continue
                matched += 1
                idf = math.log(1.0 + (n - gdf + 0.5) / (gdf + 0.5))
                s += (
                    q
                    * idf
                    * gtf
                    * (k1 + 1.0)
                    / (gtf + k1 * (1.0 - b + b * dl / avgdl))
                )
            if matched == 0:
                continue
            if mode == "conjunctive" and matched != n_groups:
                continue
            rows.append((doc_id, int(math.floor(s * 1e4 + 0.5))))
        rows.sort(key=lambda r: (-r[1], r[0]))
        parts.append(
            pd.DataFrame(
                [(qid, i + 1, d, sq) for i, (d, sq) in enumerate(rows[:k])],
                columns=["query_id", "rank", "doc_id", "score_q"],
            )
        )
    return pd.concat(parts, ignore_index=True)


def _run(small_index, queries, synonyms, mode="disjunctive"):
    return (
        search_synonyms(small_index, queries, synonyms, mode=mode)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)[["query_id", "rank", "doc_id", "score_q"]]
        .astype("int64")
    )


def test_synonym_identity_disjunctive(small_index, corpus_stats):
    got = _run(small_index, QUERIES, SYNONYMS)
    want = _brute(corpus_stats, QUERIES, SYNONYMS, "disjunctive").astype(
        "int64"
    )
    pd.testing.assert_frame_equal(got, want)


def test_synonym_identity_conjunctive(small_index, corpus_stats):
    got = _run(small_index, QUERIES, SYNONYMS, mode="conjunctive")
    want = _brute(corpus_stats, QUERIES, SYNONYMS, "conjunctive").astype(
        "int64"
    )
    pd.testing.assert_frame_equal(got, want)
    # query 3 carries an unseen term: its group can never match, so
    # the conjunctive law excludes query 3 entirely
    assert (got.query_id == 3).sum() == 0


def test_empty_map_collapses_to_plain_search(small_index):
    a = (
        search(small_index, QUERIES)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    b = (
        search_synonyms(small_index, QUERIES, {})
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_synonym_changes_results(small_index):
    """The blended group must actually widen the hit set vs the plain
    query (sanity that the corpus exercises the law)."""
    plain = search(small_index, [(1, "merge", 50)]).toPandas()
    blended = search_synonyms(
        small_index, [(1, "merge", 50)], {"merge": ["join"]}
    ).toPandas()
    assert set(plain.doc_id) < set(blended.doc_id) or len(blended) > len(plain)


def test_synonym_validation(small_index):
    with pytest.raises(ValueError):
        search_synonyms(
            small_index, QUERIES, {"merge": ["two words here"]}
        )
    with pytest.raises(ValueError):
        search_synonyms(small_index, QUERIES, SYNONYMS, mode="nope")
    # all-unseen query set -> empty with the contract schema
    out = search_synonyms(
        small_index, [(9, "zzz", 5)], {"zzz": ["qqq"]}
    ).toPandas()
    assert len(out) == 0
