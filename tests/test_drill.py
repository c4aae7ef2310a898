"""DrillDownQuery / DrillSideways analogs (operators/query.py):
drill-down top-k must equal the plain search filtered to the
constraint set (ranks and quantized scores re-derived), and sideways
counts must match a brute-force recount of the Lucene law — a
constrained dim is counted under every OTHER constraint but not its
own; an unconstrained dim under all of them."""

import pandas as pd
import pytest

from org_rdkit_lucene_spark.functions.tokenizer import tokenize_text
from org_rdkit_lucene_spark.operators.query import (
    drill_sideways_counts,
    search,
    search_drill_down,
)

QUERIES = [(1, "merg join spark", 10), (2, "hash tabl scan", 8)]


@pytest.fixture(scope="module")
def doc_facets(small_index, small_pdf):
    """doc_id -> (lang, repo, matched-terms set) brute-force view."""
    docmap = small_index.docmap.toPandas()
    src = small_pdf.merge(docmap, on=["repo", "path", "commit"])
    out = {}
    for r in src.itertuples():
        out[int(r.doc_id)] = (r.lang, r.repo, set(tokenize_text(r.content)))
    return out


def _hits(doc_facets, text):
    words = set(tokenize_text(text))
    return {
        d: (lang, repo)
        for d, (lang, repo, toks) in doc_facets.items()
        if words & toks
    }


def test_drill_down_equals_filtered_rerank(small_index, doc_facets):
    """Engine drill-down == brute-force: rank the constrained hit set
    by the SAME scores the unconstrained search assigns."""
    drill = {"lang": "py"}
    got = (
        search_drill_down(small_index, QUERIES, drill)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    # oracle: take the FULL ranked list (k = corpus size), drop docs
    # violating the constraint, re-rank the survivors
    big = [(qid, text, len(doc_facets)) for qid, text, _ in QUERIES]
    full = search(small_index, big).toPandas()
    parts = []
    for qid, text, k in QUERIES:
        sub = full[full.query_id == qid].sort_values("rank")
        keep = sub[
            sub.doc_id.map(lambda d: doc_facets[int(d)][0] == "py")
        ].head(k)
        keep = keep.assign(rank=range(1, len(keep) + 1))
        parts.append(keep)
    want = pd.concat(parts, ignore_index=True)
    pd.testing.assert_frame_equal(
        got[["query_id", "rank", "doc_id", "score_q"]].astype("int64"),
        want[["query_id", "rank", "doc_id", "score_q"]]
        .reset_index(drop=True)
        .astype("int64"),
    )


def test_drill_sideways_law(small_index, doc_facets):
    """Constrained dim counted under the OTHER constraints only;
    unconstrained dim under all constraints; empty combos absent."""
    some_repo = next(iter(doc_facets.values()))[1]
    drill = {"lang": "py", "repo": some_repo}
    got = (
        drill_sideways_counts(
            small_index, QUERIES, drill, ["lang", "repo", "commit"]
        )
        .toPandas()
        .set_index(["query_id", "dim", "facet"])["n_docs"]
        .to_dict()
    )
    for qid, text, _ in QUERIES:
        hits = _hits(doc_facets, text)
        # sideways lang: repo constraint only
        want_lang: dict[str, int] = {}
        for d, (lang, repo) in hits.items():
            if repo == some_repo:
                want_lang[lang] = want_lang.get(lang, 0) + 1
        # sideways repo: lang constraint only
        want_repo: dict[str, int] = {}
        for d, (lang, repo) in hits.items():
            if lang == "py":
                want_repo[repo] = want_repo.get(repo, 0) + 1
        # unconstrained dim (commit): ALL constraints apply
        n_full = sum(
            1
            for d, (lang, repo) in hits.items()
            if lang == "py" and repo == some_repo
        )
        for lang, n in want_lang.items():
            assert got[(qid, "lang", lang)] == n
        for repo, n in want_repo.items():
            assert got[(qid, "repo", repo)] == n
        commit_rows = {
            k: v for k, v in got.items() if k[0] == qid and k[1] == "commit"
        }
        assert sum(commit_rows.values()) == n_full
        # nothing beyond the brute-force keys for this query
        assert {
            k[2] for k in got if k[0] == qid and k[1] == "lang"
        } == set(want_lang)
        assert {
            k[2] for k in got if k[0] == qid and k[1] == "repo"
        } == set(want_repo)


def test_drill_validation(small_index):
    with pytest.raises(ValueError):
        search_drill_down(small_index, QUERIES, {})
    with pytest.raises(ValueError):
        drill_sideways_counts(small_index, QUERIES, {"lang": "py"}, [])


def test_taxonomy_facet_counts_law(small_index, doc_facets, small_pdf):
    """Hierarchical taxonomy facets == brute force: every path prefix
    up to depth counts the matching docs that carry it; top_n per
    (query, level) by (n_docs DESC, facet_path ASC)."""
    from collections import Counter

    from org_rdkit_lucene_spark.operators.query import taxonomy_facet_counts

    docmap = small_index.docmap.toPandas()
    src = small_pdf.merge(docmap, on=["repo", "path", "commit"])
    paths = {int(r.doc_id): r.path for r in src.itertuples()}
    depth, top_n = 3, 5
    got = (
        taxonomy_facet_counts(
            small_index, QUERIES, depth=depth, top_n=top_n
        )
        .toPandas()
        .sort_values(["query_id", "level", "rank"])
        .reset_index(drop=True)
    )
    parts = []
    for qid, text, _k in QUERIES:
        hit_ids = _hits(doc_facets, text).keys()
        c = Counter()
        for d in hit_ids:
            segs = paths[d].split("/")
            for lvl in range(1, min(len(segs), depth) + 1):
                c[(lvl, "/".join(segs[:lvl]))] += 1
        for lvl in sorted({l for l, _ in c}):
            ranked = sorted(
                ((n, fp) for (l, fp), n in c.items() if l == lvl),
                key=lambda t: (-t[0], t[1]),
            )[:top_n]
            for r, (n, fp) in enumerate(ranked, start=1):
                parts.append((qid, lvl, r, fp, n))
    want = pd.DataFrame(
        parts, columns=["query_id", "level", "rank", "facet_path", "n_docs"]
    )
    pd.testing.assert_frame_equal(
        got.astype({"query_id": "int64", "level": "int64",
                    "rank": "int64", "n_docs": "int64"}),
        want.astype({"query_id": "int64", "level": "int64",
                     "rank": "int64", "n_docs": "int64"}),
        check_dtype=False,
    )


def test_taxonomy_facet_depth_one_counts_exact(
    small_index, doc_facets, small_pdf
):
    """depth=1 with an unbounded top_n is a FULL recount by first path
    segment — every (query, segment) count compared exactly (the weak
    shape-only predecessor of this test let a count regression pass)."""
    from collections import Counter

    from org_rdkit_lucene_spark.operators.query import taxonomy_facet_counts

    docmap = small_index.docmap.toPandas()
    src = small_pdf.merge(docmap, on=["repo", "path", "commit"])
    paths = {int(r.doc_id): r.path for r in src.itertuples()}
    tax = (
        taxonomy_facet_counts(small_index, QUERIES, depth=1, top_n=10**6)
        .toPandas()
    )
    for qid, text, _k in QUERIES:
        c = Counter(
            paths[d].split("/")[0] for d in _hits(doc_facets, text)
        )
        sub = tax[tax.query_id == qid]
        assert (sub.level == 1).all()
        got = dict(zip(sub.facet_path, sub.n_docs.astype(int)))
        assert got == dict(c)


def test_taxonomy_top_children_law(small_index, doc_facets, small_pdf):
    """getTopChildren(under): only docs strictly under the path count,
    grouped by their direct child prefix; the doc AT the path has no
    children."""
    from collections import Counter

    from org_rdkit_lucene_spark.operators.query import taxonomy_facet_counts

    docmap = small_index.docmap.toPandas()
    src = small_pdf.merge(docmap, on=["repo", "path", "commit"])
    paths = {int(r.doc_id): r.path for r in src.itertuples()}
    under = next(iter(paths.values())).split("/")[0]  # e.g. "src"
    u = 1
    got = (
        taxonomy_facet_counts(
            small_index, QUERIES, under=under, top_n=5
        )
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    parts_rows = []
    for qid, text, _k in QUERIES:
        c = Counter()
        for d in _hits(doc_facets, text):
            segs = paths[d].split("/")
            if len(segs) > u and "/".join(segs[:u]) == under:
                c["/".join(segs[: u + 1])] += 1
        ranked = sorted(c.items(), key=lambda t: (-t[1], t[0]))[:5]
        for r, (fp, n) in enumerate(ranked, start=1):
            parts_rows.append((qid, u + 1, r, fp, n))
    want = pd.DataFrame(
        parts_rows,
        columns=["query_id", "level", "rank", "facet_path", "n_docs"],
    )
    pd.testing.assert_frame_equal(
        got.astype({"query_id": "int64", "level": "int64",
                    "rank": "int64", "n_docs": "int64"}),
        want.astype({"query_id": "int64", "level": "int64",
                     "rank": "int64", "n_docs": "int64"}),
        check_dtype=False,
    )


def test_taxonomy_top_children_oracle_parity(small_index, small_pdf):
    """Engine == DuckDB twin for the under= refinement (path rebuilt
    from the test corpus columns)."""
    import duckdb

    from org_rdkit_lucene_spark.operators.query import taxonomy_facet_counts
    from org_rdkit_lucene_spark.oracle.sqlgen import taxonomy_facet_counts_sql

    docmap = small_index.docmap.toPandas()
    src = small_pdf.merge(docmap, on=["repo", "path", "commit"])
    under = src.path.iloc[0].split("/")[0]
    got = (
        taxonomy_facet_counts(small_index, QUERIES, under=under, top_n=5)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register(
        "documents",
        src.rename(columns={"content": "text"})[["doc_id", "text", "path"]],
    )
    want = con.execute(
        taxonomy_facet_counts_sql(
            QUERIES, top_n=5, under=under, path_expr="d.path"
        )
    ).df()
    cols = ["query_id", "level", "rank", "facet_path", "n_docs"]
    pd.testing.assert_frame_equal(
        got[cols].astype({"query_id": "int64", "level": "int64",
                          "rank": "int64", "n_docs": "int64"}),
        want[cols].astype({"query_id": "int64", "level": "int64",
                           "rank": "int64", "n_docs": "int64"}),
        check_dtype=False,
    )
