"""Q1 query-syntax surface (MultiFieldQueryParser analog): +required,
-excluded, "phrase", bare OR terms — parser unit tests + engine
semantics against brute-force checks."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from org_rdkit_lucene_spark.config import IndexConfig
from org_rdkit_lucene_spark.functions.tokenizer import tokenize_text
from org_rdkit_lucene_spark.operators.query import (
    max_scores,
    parse_query,
    search,
    search_syntax,
)


def test_parse_query():
    p = parse_query('+getIndex -deprecated "hash table" scan merge')
    assert p == {
        "required": ["getIndex"],
        "optional": ["scan", "merge"],
        "excluded": ["deprecated"],
        "phrases": ["hash table"],
        "fields": [],
        "prefixes": [],
        "fuzzies": [],
        "wildcards": [],
        "ranges": [],
        "slop_phrases": [],
        "req_boosts": [1.0],
        "opt_boosts": [1.0, 1.0],
        "regexps": [],
        "field_phrases": [],
        "field_prefixes": [],
        "field_wildcards": [],
        "field_fuzzies": [],
        "field_ranges": [],
        "field_regexps": [],
        "phrase_boosts": [1.0],
        "slop_phrase_boosts": [],
        "field_boosts": [],
        "field_phrase_boosts": [],
        "prefix_boosts": [],
        "wildcard_boosts": [],
        "fuzzy_boosts": [],
        "range_boosts": [],
        "regexp_boosts": [],
        "field_prefix_boosts": [],
        "field_wildcard_boosts": [],
        "field_fuzzy_boosts": [],
        "field_range_boosts": [],
        "field_regexp_boosts": [],
    }
    empty = parse_query("")
    assert all(
        empty[k] == []
        for k in ("required", "optional", "excluded", "phrases", "fields",
                  "prefixes", "fuzzies", "wildcards", "ranges",
                  "slop_phrases", "req_boosts", "opt_boosts")
    )
    assert parse_query('""')["phrases"] == []


def test_parse_query_boosts():
    p = parse_query("merge^2 +table^0.5 scan^10 plain")
    assert p["optional"] == ["merge", "scan", "plain"]
    assert p["opt_boosts"] == [2.0, 10.0, 1.0]
    assert p["required"] == ["table"] and p["req_boosts"] == [0.5]
    # malformed boosts: the word stays INTACT (boost 1.0)
    for w in ("a^", "a^b", "a^-1"):
        q = parse_query(w)
        assert q["optional"] == [w] and q["opt_boosts"] == [1.0], w
    # round 5: boosts apply to EVERY clause form — the base keeps its
    # clause kind (previously pre*^2 degraded to a literal term)
    q = parse_query("pre*^2")
    assert q["prefixes"] == ["pre"] and q["prefix_boosts"] == [2.0]
    q = parse_query("fz~^2")
    assert q["fuzzies"] == [("fz", 1)] and q["fuzzy_boosts"] == [2.0]
    # stacked boost: the trailing one wins as the clause boost, the
    # rest stays part of the word
    q = parse_query("a^2^3")
    assert q["optional"] == ["a^2"] and q["opt_boosts"] == [3.0]


def test_syntax_scoring_weights_boost_law():
    from org_rdkit_lucene_spark.operators.query import syntax_scoring_weights
    from org_rdkit_lucene_spark.config import ANALYZERS

    prof = ANALYZERS["code_default"]
    # optional occurrences sum their boosts; required pins at max boost
    w, must = syntax_scoring_weights(parse_query("merg^2 merg^3"), prof)
    assert w == {"merg": 5.0} and must == set()
    w, must = syntax_scoring_weights(parse_query("+merg^2 merg merg^9"), prof)
    assert w == {"merg": 2.0} and must == {"merg"}
    # phrases pin at 1.0 even when an optional boost exists
    w, must = syntax_scoring_weights(parse_query('"merg" merg^7'), prof)
    assert w == {"merg": 1.0} and must == {"merg"}
    # unboosted law identical to the round-1 integer law
    w, must = syntax_scoring_weights(parse_query("+a b b c"), prof)
    assert w == {"a": 1.0, "b": 2.0, "c": 1.0} and must == {"a"}


def test_parse_query_prefixes():
    p = parse_query("Mer* +join sca* -old")
    assert p["prefixes"] == ["mer", "sca"]  # lowercased, star stripped
    assert p["required"] == ["join"] and p["excluded"] == ["old"]
    # only a single TRAILING star makes a prefix clause
    assert parse_query("a*b")["prefixes"] == []
    assert parse_query("*")["prefixes"] == []
    assert parse_query("a**")["prefixes"] == []


def test_parse_query_fields():
    p = parse_query("lang:PY path:src3 repo:r1 merge commit:abc")
    assert p["fields"] == [("lang", "py"), ("path", "src3"), ("repo", "r1")]
    # unknown field prefix stays an ordinary term
    assert p["optional"] == ["merge", "commit:abc"]


@pytest.fixture(scope="module")
def syn_corpus(small_index, small_corpus):
    return small_corpus.join(small_index.docmap, ["repo", "path", "commit"])


def test_bare_terms_equal_disjunctive(small_index, syn_corpus):
    """Bare-term syntax == plain disjunctive search."""
    q = [(1, "merg scorer token", 10)]
    a = search_syntax(small_index, syn_corpus, q).toPandas().sort_values("rank").reset_index(drop=True)
    b = search(small_index, q).toPandas().sort_values("rank").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_required_filters_but_all_terms_score(small_index, syn_corpus, small_pdf):
    """+term restricts hits to docs containing it; every returned doc
    contains the required token."""
    out = search_syntax(small_index, syn_corpus, [(1, "+merg scorer", 20)]).toPandas()
    assert len(out) > 0
    docmap = small_index.docmap.toPandas()
    src = small_pdf.merge(docmap, on=["repo", "path", "commit"]).set_index("doc_id")
    from org_rdkit_lucene_spark.functions.tokenizer import tokenize_text

    for d in out["doc_id"]:
        assert "merg" in tokenize_text(src.loc[int(d), "content"])


def test_excluded_removes_docs(small_index, syn_corpus, small_pdf):
    base = search_syntax(small_index, syn_corpus, [(1, "merg scorer", 50)]).toPandas()
    excl = search_syntax(small_index, syn_corpus, [(1, "merg scorer -get", 50)]).toPandas()
    docmap = small_index.docmap.toPandas()
    src = small_pdf.merge(docmap, on=["repo", "path", "commit"]).set_index("doc_id")
    from org_rdkit_lucene_spark.functions.tokenizer import tokenize_text

    for d in excl["doc_id"]:
        assert "get" not in tokenize_text(src.loc[int(d), "content"])
    # some base hits did contain the excluded term, so the sets differ
    dropped = set(base["doc_id"]) - set(excl["doc_id"])
    assert dropped


def test_phrase_verifies_substring(small_index, syn_corpus, small_pdf):
    out = search_syntax(small_index, syn_corpus, [(1, '"merg" scorer', 20)]).toPandas()
    docmap = small_index.docmap.toPandas()
    src = small_pdf.merge(docmap, on=["repo", "path", "commit"]).set_index("doc_id")
    assert len(out) > 0
    for d in out["doc_id"]:
        assert "merg" in src.loc[int(d), "content"]


def test_mixed_batch_no_cross_query_interference(small_index, syn_corpus):
    """Phrase-less and phrase queries in one batch must not affect each
    other (regression: inner join on phrases dropped phrase-less ones)."""
    qs = [(1, "+merg scorer -get", 10), (2, '"scor" token', 10), (3, "token", 5)]
    batch = search_syntax(small_index, syn_corpus, qs).toPandas()
    for qid, text, k in qs:
        solo = search_syntax(small_index, syn_corpus, [(qid, text, k)]).toPandas()
        got = batch[batch.query_id == qid].sort_values("rank").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, solo.sort_values("rank").reset_index(drop=True))


def test_parse_query_fuzzies():
    p = parse_query("Merje~ tablr~2 x~9 plain")
    assert p["fuzzies"] == [("merje", 1), ("tablr", 2), ("x", 2)]  # 9 clamps to 2
    assert p["optional"] == ["plain"]
    # malformed fuzzies stay ordinary terms
    assert parse_query("a~b")["fuzzies"] == []
    assert parse_query("~")["fuzzies"] == []
    assert parse_query("a~~")["fuzzies"] == []


def test_fuzzy_expansion_matches_manual_disjunction(small_index, syn_corpus):
    """term~ must equal a hand-built disjunction of its levenshtein
    expansion, and every expanded term must be within the distance."""
    from org_rdkit_lucene_spark.operators.query import (
        _bm25_scored,
        _levenshtein,
        expand_fuzzies,
        rank_topk,
    )

    exp = expand_fuzzies(small_index, [("merg", 1)])[("merg", 1)]
    assert "merg" in exp and len(exp) > 1  # merg + merg1..merg9 etc.
    assert all(_levenshtein(t, "merg") <= 1 for t in exp)
    qterms = pd.DataFrame(
        [(1, t, 1, len(exp), 10) for t in exp],
        columns=["query_id", "term", "qtf", "n_terms", "k"],
    )
    scored, est = _bm25_scored(small_index, qterms)
    want = (
        rank_topk(scored, small_index.cfg.bm25.score_decimals,
                  est_candidates=est["disjunctive"], max_k=10)
        .toPandas().sort_values("rank").reset_index(drop=True)
    )
    got = (
        search_syntax(small_index, syn_corpus, [(1, "merg~", 10)])
        .toPandas().sort_values("rank").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_prefix_expansion_matches_manual_disjunction(small_index, syn_corpus):
    """term* must equal a hand-built disjunction of its lexicon
    expansion (each expanded term one SHOULD occurrence)."""
    from org_rdkit_lucene_spark.operators.query import (
        _bm25_scored,
        expand_prefixes,
        rank_topk,
    )

    exp = expand_prefixes(small_index, ["scor"])["scor"]
    assert exp  # fixture vocabulary contains scor-rooted terms
    qterms = pd.DataFrame(
        [(1, t, 1, len(exp), 10) for t in exp],
        columns=["query_id", "term", "qtf", "n_terms", "k"],
    )
    scored, est = _bm25_scored(small_index, qterms)
    want = (
        rank_topk(scored, small_index.cfg.bm25.score_decimals,
                  est_candidates=est["disjunctive"], max_k=10)
        .toPandas().sort_values("rank").reset_index(drop=True)
    )
    got = (
        search_syntax(small_index, syn_corpus, [(1, "scor*", 10)])
        .toPandas().sort_values("rank").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_prefix_expansion_bounded_and_df_ordered(small_index, monkeypatch):
    """The expansion takes the top-N matching terms by (df DESC, term
    ASC) — the bound that keeps one-letter prefixes metadata-sized."""
    from org_rdkit_lucene_spark.operators import query as qmod

    full = qmod.expand_prefixes(small_index, ["s"])["s"]
    assert len(full) > 2
    lex = (
        small_index.lexicon.toPandas()
    )
    m = lex[lex["term"].str.startswith("s")].sort_values(
        ["df", "term"], ascending=[False, True]
    )
    assert full == m["term"].head(qmod.PREFIX_EXPANSION_LIMIT).tolist()

    monkeypatch.setattr(qmod, "PREFIX_EXPANSION_LIMIT", 2)
    assert qmod.expand_prefixes(small_index, ["s"])["s"] == full[:2]


def test_prefix_zero_expansion_is_inert(small_index, syn_corpus):
    """A prefix matching nothing adds no clauses; the rest of the query
    still scores (the missing-term law)."""
    base = search_syntax(small_index, syn_corpus, [(1, "merg scorer", 10)]).toPandas()
    with_dead = search_syntax(
        small_index, syn_corpus, [(1, "merg scorer zzzq*", 10)]
    ).toPandas()
    pd.testing.assert_frame_equal(
        base.sort_values("rank").reset_index(drop=True),
        with_dead.sort_values("rank").reset_index(drop=True),
    )


def test_parse_query_wildcards():
    p = parse_query("M?rg mi*dle w?rke* +join -old te*")
    assert p["wildcards"] == ["m?rg", "mi*dle", "w?rke*"]  # lowercased
    assert p["prefixes"] == ["te"]  # pure trailing-* stays a prefix
    assert p["required"] == ["join"] and p["excluded"] == ["old"]
    # leading wildcards are NOT supported (Lucene default): word intact
    for w in ("*term", "?erm", "**", "?"):
        q = parse_query(w)
        assert q["wildcards"] == [] and q["optional"] == [w], w
    # combined-operator words degrade without becoming wildcards
    assert parse_query("te?m~")["wildcards"] == []
    # round 5: a trailing boost no longer hides the wildcard kind
    q = parse_query("a?b^2")
    assert q["wildcards"] == ["a?b"] and q["wildcard_boosts"] == [2.0]
    assert q["optional"] == []


def test_wildcard_regex_law():
    from org_rdkit_lucene_spark.operators.query import wildcard_regex
    import re

    rx = re.compile(wildcard_regex("w?rke*"))
    assert rx.match("worker") and rx.match("warke")
    assert not rx.match("wrke") and not rx.match("aworker")
    # * may match empty; ? must match exactly one
    assert re.compile(wildcard_regex("ab*")).match("ab")
    assert not re.compile(wildcard_regex("a?b")).match("ab")
    # non-alnum literals are escaped, not treated as regex metachars
    assert re.compile(wildcard_regex("a.b?")).match("a.bc")
    assert not re.compile(wildcard_regex("a.b?")).match("axbc")


def test_wildcard_expansion_matches_manual_disjunction(small_index, syn_corpus):
    """A wildcard clause must equal a hand-built disjunction of its
    lexicon expansion (each expanded term one SHOULD occurrence)."""
    from org_rdkit_lucene_spark.operators.query import (
        _bm25_scored,
        expand_wildcards,
        rank_topk,
        wildcard_regex,
    )
    import re

    exp = expand_wildcards(small_index, ["w?rke*"])["w?rke*"]
    assert "worker" in exp and len(exp) > 1
    rx = re.compile(wildcard_regex("w?rke*"))
    assert all(rx.match(t) for t in exp)
    qterms = pd.DataFrame(
        [(1, t, 1, len(exp), 10) for t in exp],
        columns=["query_id", "term", "qtf", "n_terms", "k"],
    )
    scored, est = _bm25_scored(small_index, qterms)
    want = (
        rank_topk(scored, small_index.cfg.bm25.score_decimals,
                  est_candidates=est["disjunctive"], max_k=10)
        .toPandas().sort_values("rank").reset_index(drop=True)
    )
    got = (
        search_syntax(small_index, syn_corpus, [(1, "w?rke*", 10)])
        .toPandas().sort_values("rank").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_wildcard_expansion_bounded_and_df_ordered(small_index, monkeypatch):
    """Expansion takes the top-N matches by (df DESC, term ASC), like
    prefixes — the bound that keeps hot patterns metadata-sized."""
    from org_rdkit_lucene_spark.operators import query as qmod
    import re

    full = qmod.expand_wildcards(small_index, ["s*"])["s*"]
    assert len(full) > 2
    lex = small_index.lexicon.toPandas()
    rx = re.compile(qmod.wildcard_regex("s*"))
    m = lex[lex["term"].map(lambda t: rx.match(t) is not None)].sort_values(
        ["df", "term"], ascending=[False, True]
    )
    assert full == m["term"].head(qmod.WILDCARD_EXPANSION_LIMIT).tolist()

    monkeypatch.setattr(qmod, "WILDCARD_EXPANSION_LIMIT", 2)
    assert qmod.expand_wildcards(small_index, ["s*"])["s*"] == full[:2]


def test_wildcard_zero_expansion_is_inert(small_index, syn_corpus):
    base = search_syntax(small_index, syn_corpus, [(1, "merg scorer", 10)]).toPandas()
    with_dead = search_syntax(
        small_index, syn_corpus, [(1, "merg scorer zz?q*", 10)]
    ).toPandas()
    pd.testing.assert_frame_equal(
        base.sort_values("rank").reset_index(drop=True),
        with_dead.sort_values("rank").reset_index(drop=True),
    )


def test_parse_query_ranges():
    p = parse_query("[Merg TO Scorer] join {a TO b} [c TO *] [* TO d]")
    assert p["ranges"] == [
        ("merg", "scorer", True, True),   # inclusive, lowercased
        ("a", "b", False, False),         # exclusive
        ("c", None, True, True),          # open upper bound
        (None, "d", True, True),          # open lower bound
    ]
    assert p["optional"] == ["join"]
    # [* TO *] is inert (matches the whole dictionary — dropped)
    assert parse_query("[* TO *] x")["ranges"] == []
    # malformed ranges never parse as ranges (lowercase to, missing
    # bracket, quoted) — the words fall through to ordinary clauses
    for bad in ("[a to b]", "[a TO", "a TO b]", '["a" TO b]'):
        assert parse_query(bad)["ranges"] == [], bad


def test_range_expansion_matches_manual_disjunction(small_index, syn_corpus):
    """A range clause must equal a hand-built disjunction of its
    lexicon expansion (each expanded term one SHOULD occurrence)."""
    from org_rdkit_lucene_spark.operators.query import (
        _bm25_scored,
        expand_ranges,
        rank_topk,
    )

    rng = ("m", "mz", True, True)
    exp = expand_ranges(small_index, [rng])[rng]
    assert "merg" in exp and len(exp) > 1
    assert all("m" <= t <= "mz" for t in exp)
    qterms = pd.DataFrame(
        [(1, t, 1, len(exp), 10) for t in exp],
        columns=["query_id", "term", "qtf", "n_terms", "k"],
    )
    scored, est = _bm25_scored(small_index, qterms)
    want = (
        rank_topk(scored, small_index.cfg.bm25.score_decimals,
                  est_candidates=est["disjunctive"], max_k=10)
        .toPandas().sort_values("rank").reset_index(drop=True)
    )
    got = (
        search_syntax(small_index, syn_corpus, [(1, "[m TO mz]", 10)])
        .toPandas().sort_values("rank").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_range_inclusivity_and_bound(small_index, monkeypatch):
    """{a TO b} excludes exactly the endpoint terms of [a TO b]; the
    expansion is top-N by (df DESC, term ASC) like its siblings."""
    from org_rdkit_lucene_spark.operators import query as qmod

    lex = small_index.lexicon.toPandas().sort_values("term")
    terms = lex["term"].tolist()
    lo, hi = terms[1], terms[4]  # real lexicon terms as endpoints
    incl = qmod.expand_ranges(small_index, [(lo, hi, True, True)])
    excl = qmod.expand_ranges(small_index, [(lo, hi, False, False)])
    assert set(incl[(lo, hi, True, True)]) - set(excl[(lo, hi, False, False)]) == {lo, hi}

    m = lex[(lex["term"] >= lo) & (lex["term"] <= hi)].sort_values(
        ["df", "term"], ascending=[False, True]
    )
    assert incl[(lo, hi, True, True)] == m["term"].head(
        qmod.RANGE_EXPANSION_LIMIT
    ).tolist()

    full = qmod.expand_ranges(small_index, [("a", "zz", True, True)])[
        ("a", "zz", True, True)
    ]
    assert len(full) > 2
    monkeypatch.setattr(qmod, "RANGE_EXPANSION_LIMIT", 2)
    assert qmod.expand_ranges(small_index, [("a", "zz", True, True)])[
        ("a", "zz", True, True)
    ] == full[:2]


def test_range_zero_expansion_is_inert(small_index, syn_corpus):
    base = search_syntax(small_index, syn_corpus, [(1, "merg scorer", 10)]).toPandas()
    with_dead = search_syntax(
        small_index, syn_corpus, [(1, "merg scorer [zzza TO zzzb]", 10)]
    ).toPandas()
    pd.testing.assert_frame_equal(
        base.sort_values("rank").reset_index(drop=True),
        with_dead.sort_values("rank").reset_index(drop=True),
    )


def test_parse_query_slop_phrases():
    p = parse_query('"Merge scan"~2 x "a b" "c d"~0 "e f"~')
    assert p["slop_phrases"] == [("Merge scan", 2)]
    # ~0 and a bare ~ degrade to the exact-phrase law
    assert p["phrases"] == ["a b", "c d", "e f"]
    assert p["optional"] == ["x", "~"]  # the dangling ~ is a plain word
    q = parse_query('"a b"~3 "a b"~3')
    assert q["slop_phrases"] == [("a b", 3), ("a b", 3)]
    assert parse_query('""~2')["slop_phrases"] == []


def test_slop_match_law():
    from org_rdkit_lucene_spark.operators.query import _slop_match

    toks = "a x b y c".split()
    assert _slop_match(toks, ["a", "b"], 1)          # span 2 = 1+1
    assert not _slop_match(toks, ["a", "b"], 0)      # not adjacent
    assert not _slop_match(toks, ["b", "a"], 5)      # order matters
    assert _slop_match(toks, ["a", "b", "c"], 2)     # span 4 = 2+2
    assert not _slop_match(toks, ["a", "b", "c"], 1)
    assert _slop_match(toks, ["x"], 0)               # single-token = presence
    assert not _slop_match(toks, ["z"], 9)
    # greedy-earliest must not miss a later valid start
    toks2 = "b a z z z b".split()  # first b useless; a@1..b@5 needs slop 3
    assert _slop_match(toks2, ["a", "b"], 3)
    assert not _slop_match(toks2, ["a", "b"], 2)
    # duplicate phrase words need distinct positions
    assert _slop_match("a a".split(), ["a", "a"], 0)
    assert not _slop_match(["a"], ["a", "a"], 9)


def test_sloppy_phrase_filters_by_token_window(small_index, syn_corpus, spark):
    """Engine results for '\"w1 w2\"~s' must equal the brute-force law:
    BM25 candidates restricted to docs whose analyzed token stream
    satisfies _slop_match — checked against a pandas recomputation."""
    from org_rdkit_lucene_spark.operators.query import _slop_match

    ph, slop = "merg hash", 3
    got = search_syntax(
        small_index, syn_corpus, [(1, f'"{ph}"~{slop}', 1000)]
    ).toPandas()
    corpus = syn_corpus.select("doc_id", "content").toPandas()
    words = tokenize_text(ph)
    expect = {
        int(r.doc_id)
        for r in corpus.itertuples(index=False)
        if _slop_match(tokenize_text(r.content), words, slop)
    }
    assert set(got["doc_id"]) == expect and len(expect) > 0
    # tightening the slop can only shrink the hit set
    tight = search_syntax(
        small_index, syn_corpus, [(1, f'"{ph}"~1', 1000)]
    ).toPandas()
    assert set(tight["doc_id"]) <= set(got["doc_id"])


def test_boosted_search_matches_manual_weights(small_index, syn_corpus):
    """merg^2 scorer must equal a hand-built scored pass with qtf
    [2.0, 1.0] — the boost is exactly a clause-weight multiplier."""
    from org_rdkit_lucene_spark.operators.query import _bm25_scored, rank_topk

    qterms = pd.DataFrame(
        [(1, "merg", 2.0, 2, 10), (1, "scorer", 1.0, 2, 10)],
        columns=["query_id", "term", "qtf", "n_terms", "k"],
    )
    scored, est = _bm25_scored(small_index, qterms)
    want = (
        rank_topk(scored, small_index.cfg.bm25.score_decimals,
                  est_candidates=est["disjunctive"], max_k=10)
        .toPandas().sort_values("rank").reset_index(drop=True)
    )
    got = (
        search_syntax(small_index, syn_corpus, [(1, "merg^2 scorer", 10)])
        .toPandas().sort_values("rank").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    # and differs from the unboosted ranking law only via the weights:
    # a boost of 1.0 written explicitly is a no-op
    noop = (
        search_syntax(small_index, syn_corpus, [(1, "merg^1.0 scorer", 10)])
        .toPandas().sort_values("rank").reset_index(drop=True)
    )
    plain = (
        search_syntax(small_index, syn_corpus, [(1, "merg scorer", 10)])
        .toPandas().sort_values("rank").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(noop, plain)


def test_parse_boolean_grammar():
    from org_rdkit_lucene_spark.operators.query import parse_boolean

    # AND binds tighter than OR; adjacency = implicit OR
    assert parse_boolean("a AND b OR c") == (
        "or", [("and", [("word", "a"), ("word", "b")]), ("word", "c")]
    )
    assert parse_boolean("a b") == ("or", [("word", "a"), ("word", "b")])
    assert parse_boolean("(a OR b) AND c") == (
        "and", [("or", [("word", "a"), ("word", "b")]), ("word", "c")]
    )
    assert parse_boolean("a") == ("word", "a")
    assert parse_boolean("") is None
    # permissive on unbalanced parens
    assert parse_boolean("(a AND b") == ("and", [("word", "a"), ("word", "b")])
    assert parse_boolean("a) b") == ("or", [("word", "a"), ("word", "b")])


def test_boolean_and_or_match_plain_modes(small_index):
    """'a AND b' must equal conjunctive search, 'a OR b' disjunctive —
    same candidates, same scores (the tree only filters)."""
    from org_rdkit_lucene_spark.operators.query import search_boolean

    qs_and = [(1, "merg AND token", 10)]
    a = search_boolean(small_index, qs_and).toPandas().sort_values("rank").reset_index(drop=True)
    b = search(small_index, [(1, "merg token", 10)], "conjunctive").toPandas().sort_values("rank").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    qs_or = [(2, "merg OR token", 10)]
    c = search_boolean(small_index, qs_or).toPandas().sort_values("rank").reset_index(drop=True)
    d = search(small_index, [(2, "merg token", 10)], "disjunctive").toPandas().sort_values("rank").reset_index(drop=True)
    pd.testing.assert_frame_equal(c, d)


def test_boolean_grouping_filters_correctly(small_index, small_pdf):
    """(merg AND token) OR get: every hit matches the tree; scores sum
    over ALL matched leaf terms."""
    from org_rdkit_lucene_spark.functions.tokenizer import tokenize_text
    from org_rdkit_lucene_spark.operators.query import search_boolean

    out = search_boolean(small_index, [(1, "(scor67 AND token) OR merg", 2000)]).toPandas()
    assert len(out) > 0
    docmap = small_index.docmap.toPandas()
    src = small_pdf.merge(docmap, on=["repo", "path", "commit"]).set_index("doc_id")
    n_group = n_right_only = 0
    for d in out["doc_id"]:
        toks = set(tokenize_text(src.loc[int(d), "content"]))
        grp = "scor67" in toks and "token" in toks
        assert grp or "merg" in toks
        n_group += grp
        n_right_only += (not grp) and "merg" in toks
    assert n_group and n_right_only  # both branches exercised


def test_parse_boolean_not_grammar():
    from org_rdkit_lucene_spark.operators.query import parse_boolean

    assert parse_boolean("NOT a") == ("not", ("word", "a"))
    assert parse_boolean("a AND NOT b") == (
        "and", [("word", "a"), ("not", ("word", "b"))]
    )
    assert parse_boolean("a NOT b") == (
        "or", [("word", "a"), ("not", ("word", "b"))]
    )
    assert parse_boolean("a AND NOT (b OR c)") == (
        "and", [("word", "a"), ("not", ("or", [("word", "b"), ("word", "c")]))]
    )
    assert parse_boolean("NOT") is None  # trailing NOT: dropped


def test_normalize_boolean_must_not_law():
    """Lucene BooleanQuery law: NOT children exclude on their node; a
    node with no positive clause matches nothing; NOT(pure-negative)
    is vacuous."""
    from org_rdkit_lucene_spark.operators.query import normalize_boolean

    t = lambda x: ("term", x)  # noqa: E731
    # NOT in OR position applies as MUST_NOT on the node (a NOT b)
    assert normalize_boolean(("or", [t("a"), ("not", t("b"))])) == (
        "and", [t("a"), ("not", t("b"))]
    )
    # pure-negative root / node: matches nothing
    assert normalize_boolean(("not", t("a"))) is None
    assert normalize_boolean(("and", [("not", t("a")), ("not", t("b"))])) is None
    # NOT NOT a: inner pure-negative matches nothing, exclusion vacuous
    assert normalize_boolean(("and", [t("x"), ("not", ("not", t("a")))])) == t("x")
    # positive branches keep their own exclusions
    assert normalize_boolean(
        ("or", [("and", [t("a"), ("not", t("b"))]), t("c")])
    ) == ("or", [("and", [t("a"), ("not", t("b"))]), t("c")])


def test_boolean_not_excludes(small_index, small_pdf):
    """'merg AND NOT scor67' == the merg result set minus docs containing
    scor67, scores unchanged (the excluded term never scores a survivor);
    'merg NOT scor67' and 'merg OR NOT scor67' are the same query under
    the MUST_NOT law; 'NOT token' alone returns nothing."""
    from org_rdkit_lucene_spark.functions.tokenizer import tokenize_text
    from org_rdkit_lucene_spark.operators.query import search_boolean

    a = search_boolean(small_index, [(1, "merg AND NOT scor67", 2000)]).toPandas()
    assert len(a) > 0
    # brute-force containment check
    docmap = small_index.docmap.toPandas()
    src = small_pdf.merge(docmap, on=["repo", "path", "commit"]).set_index("doc_id")
    for d in a["doc_id"]:
        toks = set(tokenize_text(src.loc[int(d), "content"]))
        assert "merg" in toks and "scor67" not in toks
    # score identity vs the unexcluded single-term result, re-ranked
    base = search(small_index, [(1, "merg", 2000)], "disjunctive").toPandas()
    keep = base[~base["doc_id"].isin(
        {int(d) for d in src.index
         if "scor67" in tokenize_text(src.loc[int(d), "content"])}
    )].sort_values(["score_q", "doc_id"], ascending=[False, True]).reset_index(drop=True)
    keep["rank"] = range(1, len(keep) + 1)
    pd.testing.assert_frame_equal(
        a.sort_values("rank").reset_index(drop=True)[["query_id", "rank", "doc_id", "score_q"]],
        keep[["query_id", "rank", "doc_id", "score_q"]].astype(a.dtypes[["query_id", "rank", "doc_id", "score_q"]].to_dict()),
    )
    # adjacency / OR forms are the same query
    for text in ("merg NOT scor67", "merg OR NOT scor67"):
        b = search_boolean(small_index, [(1, text, 2000)]).toPandas()
        pd.testing.assert_frame_equal(
            a.sort_values("rank").reset_index(drop=True),
            b.sort_values("rank").reset_index(drop=True),
        )
    # pure-negative: zero hits
    assert len(search_boolean(small_index, [(1, "NOT token", 10)]).toPandas()) == 0


def test_max_scores_equals_rank1(small_index):
    qs = [(1, "merg scorer", 10), (2, "token", 5)]
    top = search(small_index, qs).toPandas()
    ms = max_scores(small_index, qs).toPandas().set_index("query_id")["max_score_q"]
    for qid in (1, 2):
        r1 = top[(top.query_id == qid) & (top["rank"] == 1)].iloc[0]
        assert ms.loc[qid] == r1.score_q


def test_more_like_this_law(small_index, syn_corpus):
    """MLT == (manual term selection by quantized tf·idf) + disjunctive
    search over the selected terms, with the anchor removed and ranks
    recomputed."""
    import math

    from org_rdkit_lucene_spark.operators.query import more_like_this, search

    anchor, k = 7, 8
    row = syn_corpus.filter(f"doc_id = {anchor}").select("content").collect()[0]
    toks = tokenize_text(row["content"])
    tf = pd.Series(toks).value_counts().to_dict()
    lex = (
        small_index.lexicon.filter(F.col("term").isin(list(tf)))
        .select("term", "idf")
        .toPandas()
    )
    idf = dict(zip(lex["term"], lex["idf"]))
    quant = float(10 ** small_index.cfg.bm25.score_decimals)
    sel = sorted(
        ((-int(math.floor(tf[t] * idf[t] * quant + 0.5)), t) for t in tf if t in idf)
    )[:10]
    terms = [t for _, t in sel]
    assert len(terms) == 10

    got = (
        more_like_this(small_index, syn_corpus, [(1, anchor, k)])
        .toPandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    want = (
        search(small_index, [(1, " ".join(terms), k + 1)])
        .toPandas()
        .sort_values("rank")
    )
    want = want[want["doc_id"] != anchor].head(k).reset_index(drop=True)
    assert anchor not in set(got["doc_id"])
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert list(got["score_q"]) == list(want["score_q"])
    assert list(got["rank"]) == list(range(1, len(got) + 1))


def test_facet_counts_partition_hit_totals(small_index):
    """Per-facet counts must partition the A4 totals exactly: summing
    n_docs over facets reproduces hit_counts for every query, in both
    modes."""
    from org_rdkit_lucene_spark.operators.query import facet_counts, hit_counts

    qs = [(1, "merg scorer", 10), (2, "hash join scan", 10)]
    for mode in ("disjunctive", "conjunctive"):
        fc = facet_counts(small_index, qs, facet_col="lang", mode=mode).toPandas()
        hc = hit_counts(small_index, qs, mode=mode).toPandas()
        got = fc.groupby("query_id")["n_docs"].sum().to_dict()
        want = dict(zip(hc["query_id"], hc["total_hits"]))
        assert got == want
        assert fc["facet"].notna().all()
        if mode == "disjunctive":  # conjunctive may legitimately be empty
            assert sum(want.values()) > 0 and fc["facet"].nunique() > 1


def test_snippets_first_occurrence_law(small_index, syn_corpus):
    """Snippets must equal a pandas recomputation of the law: minimum
    (p, term) over verbatim query-term occurrences in lower(content),
    window 2·radius+len(term) from max(1, p-radius); head fallback."""
    from org_rdkit_lucene_spark.operators.query import search, search_snippets

    qs = [(1, "merg scorer", 6), (2, "token", 4)]
    got = search_snippets(small_index, syn_corpus, qs).toPandas()
    base = search(small_index, qs).toPandas()
    assert len(got) == len(base)
    src = syn_corpus.select("doc_id", "content").toPandas().set_index("doc_id")
    terms = {1: sorted(set(tokenize_text("merg scorer"))), 2: ["token"]}
    for row in got.itertuples(index=False):
        content = src.loc[int(row.doc_id), "content"]
        cands = sorted(
            (content.lower().find(t) + 1, t)
            for t in terms[row.query_id]
            if t in content.lower()
        )
        if cands:
            p, t = cands[0]
            want = content[max(0, p - 41):max(0, p - 41) + 80 + len(t)]
        else:
            want = content[:80]
        assert row.snippet == want, (row.query_id, row.doc_id)
    # plan: no per-row Python anywhere in the snippet path
    from org_rdkit_lucene_spark.plans import audit

    assert audit.count_nodes(
        search_snippets(small_index, syn_corpus, qs), "BatchEvalPython"
    ) == 0


def test_parse_query_field_groups(small_index, syn_corpus):
    """field:(a b) expands to one field:value SHOULD clause per group
    value — identical to writing the singles out."""
    p = parse_query("lang:(DE zh) merge repo:(r1)")
    assert p["fields"] == [("lang", "de"), ("lang", "zh"), ("repo", "r1")]
    assert p["optional"] == ["merge"]
    # empty group is inert; ungrouped field clauses still work
    q = parse_query("lang:() path:src3")
    assert q["fields"] == [("path", "src3")]
    # engine identity: grouped == singles
    a = search_syntax(small_index, syn_corpus, [(1, "lang:(de zh) merg", 10)]).toPandas()
    b = search_syntax(small_index, syn_corpus, [(1, "lang:de lang:zh merg", 10)]).toPandas()
    pd.testing.assert_frame_equal(
        a.sort_values("rank").reset_index(drop=True),
        b.sort_values("rank").reset_index(drop=True),
    )


def test_parse_query_regexps():
    p = parse_query("/M[aeiou]rg/ hash /work(er|ers)?/")
    assert p["regexps"] == ["m[aeiou]rg", "work(er|ers)?"]  # lowercased
    assert p["optional"] == ["hash"]
    # invalid / out-of-subset patterns degrade to plain words
    for w in ["/bad(/", "/a\\d/", "//", "/a b/"]:
        q = parse_query(w)
        assert q["regexps"] == [], w
    # slash-containing paths never become regexps (inner '/' rejected)
    q = parse_query("/usr/bin/ foo/bar")
    assert q["regexps"] == [] and q["optional"] == ["/usr/bin/", "foo/bar"]
    # wildcard-ish chars inside /…/ stay a regexp, not a wildcard
    q = parse_query("/b.*ch/")
    assert q["regexps"] == ["b.*ch"] and q["wildcards"] == []


def test_regexp_literal_head_law():
    from org_rdkit_lucene_spark.operators.query import _regexp_literal_head

    assert _regexp_literal_head("merg") == "merg"
    assert _regexp_literal_head("m[aeiou]rg") == "m"
    # a following quantifier consumes the run's last char
    assert _regexp_literal_head("zz+q") == "z"
    assert _regexp_literal_head("ab*c") == "a"
    assert _regexp_literal_head("ab{2,3}") == "a"
    # top-level alternation voids the head entirely
    assert _regexp_literal_head("abc|def") == ""
    assert _regexp_literal_head("work(er|ers)?") == ""


def test_regexp_expansion_matches_manual_disjunction(small_index, syn_corpus):
    """A regexp clause must equal a hand-built disjunction of its
    lexicon expansion (each expanded term one SHOULD occurrence)."""
    from org_rdkit_lucene_spark.operators.query import (
        _bm25_scored,
        expand_regexps,
        rank_topk,
        regexp_regex,
    )
    import re

    exp = expand_regexps(small_index, ["w.rke(r|rs)?"])["w.rke(r|rs)?"]
    assert "worker" in exp
    rx = re.compile(regexp_regex("w.rke(r|rs)?"))
    assert all(rx.match(t) for t in exp)
    qterms = pd.DataFrame(
        [(1, t, 1, len(exp), 10) for t in exp],
        columns=["query_id", "term", "qtf", "n_terms", "k"],
    )
    scored, est = _bm25_scored(small_index, qterms)
    want = (
        rank_topk(scored, small_index.cfg.bm25.score_decimals,
                  est_candidates=est["disjunctive"], max_k=10)
        .toPandas().sort_values("rank").reset_index(drop=True)
    )
    got = (
        search_syntax(small_index, syn_corpus, [(1, "/w.rke(r|rs)?/", 10)])
        .toPandas().sort_values("rank").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_regexp_single_term_equals_plain_search(small_index, syn_corpus):
    """/merg/ matches exactly the term 'merg', so it must rank
    identically to the bare-term query."""
    got = (
        search_syntax(small_index, syn_corpus, [(1, "/merg/", 10)])
        .toPandas().sort_values("rank").reset_index(drop=True)
    )
    want = (
        search_syntax(small_index, syn_corpus, [(1, "merg", 10)])
        .toPandas().sort_values("rank").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_phrase_positions_law(spark, tmp_path):
    """Indexed PhraseQuery law: analyzed adjacency (w_i at p+i-1), exact
    occurrence counts, repeated-word phrases, count DESC / doc ASC rank."""
    import pandas as pd

    from org_rdkit_lucene_spark.operators.positions import (
        build_positions,
        search_phrase_positions,
    )

    rows = [
        (0, "alpha beta gamma alpha beta"),   # "alpha beta" x2
        (1, "beta alpha beta gamma"),         # "alpha beta" x1
        (2, "alpha gamma beta"),              # never adjacent
        (3, "echo echo echo"),                # "echo echo" x2 (overlapping)
    ]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "content"]))
    pos = build_positions(spark, docs, str(tmp_path / "pidx"))
    out = search_phrase_positions(
        pos, [(1, "alpha beta", 10), (2, "echo echo", 10), (3, "gamma delta", 10)]
    ).toPandas()
    q1 = out[out.query_id == 1].sort_values("rank")
    assert list(zip(q1.doc_id, q1.n_occ)) == [(0, 2), (1, 1)]
    q2 = out[out.query_id == 2]
    assert list(zip(q2.doc_id, q2.n_occ)) == [(3, 2)]
    assert (out.query_id != 3).all()  # no adjacency anywhere -> no rows


def test_slop_positions_law(spark, tmp_path):
    """Indexed span-near law: ordered words within span n-1+slop;
    slop=0 reduces to adjacency; tuple counts include overlaps."""
    import pandas as pd

    from org_rdkit_lucene_spark.operators.positions import (
        build_positions,
        search_slop_positions,
    )

    rows = [
        (0, "alpha x beta"),        # alpha..beta span 2 -> needs slop>=1
        (1, "alpha beta"),          # adjacent
        (2, "beta alpha"),          # wrong order
        (3, "alpha x x x beta"),    # span 4 -> needs slop>=3
    ]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "content"]))
    pos = build_positions(spark, docs, str(tmp_path / "sidx"))
    out0 = search_slop_positions(pos, [(1, "alpha beta", 0, 10)]).toPandas()
    assert list(out0.doc_id) == [1]
    out1 = search_slop_positions(pos, [(1, "alpha beta", 1, 10)]).toPandas()
    assert sorted(out1.doc_id) == [0, 1]
    out3 = search_slop_positions(pos, [(1, "alpha beta", 3, 10)]).toPandas()
    assert sorted(out3.doc_id) == [0, 1, 3]
    assert (out3.doc_id != 2).all()  # order matters


def test_regexp_portability_rejections():
    """ADVICE r03: forms Python compiles but Java/RE2 diverge on must
    degrade to plain words — `{,n}` (Java throws, RE2 literal) and
    possessive quantifiers (RE2 rejects)."""
    from org_rdkit_lucene_spark.operators.query import _valid_regexp_clause

    for bad in ["ab{,3}", "a++", "a*+", "a?+", "a{2}+", "ab{", "a{}b", "a{x}"]:
        assert not _valid_regexp_clause(bad), bad
    for good in ["ab{2,3}", "ab{2,}", "ab{2}", "work(er|ers)?", "m[aeiou]rg", "b.*ch"]:
        assert _valid_regexp_clause(good), good
    # a rejected pattern degrades to a plain optional term, not an error
    p = parse_query("/ab{,3}/ merge")
    assert p["regexps"] == [] and "/ab{,3}/" in p["optional"]
    p2 = parse_query("/zz++/ merge")
    assert p2["regexps"] == [] and "/zz++/" in p2["optional"]


@pytest.fixture(scope="module")
def posidx(spark, tmp_path_factory):
    """A tiny index + positions artifact with token-boundary probes:
    doc 1 holds 'alpha beta' verbatim, doc 2 holds 'alpha.beta' (same
    analyzed adjacency, different raw bytes)."""
    from org_rdkit_lucene_spark.operators.build import build_index
    from org_rdkit_lucene_spark.operators.positions import build_positions

    rows = []
    for i, body in enumerate(
        [
            "alpha beta gamma marker",
            "alpha.beta gamma marker",
            "beta alpha marker",
            "alpha x beta marker",
        ]
    ):
        rows.append((i, f"org/r{i}", f"src/f{i}.py", f"c{i:03d}", "py", body))
    pdf = pd.DataFrame(
        rows, columns=["ext_id", "repo", "path", "commit", "lang", "content"]
    )
    d = str(tmp_path_factory.mktemp("syn_posidx"))
    cfg = IndexConfig(build_partitions=2, hot_term_df=50, n_salts=2)
    idx = build_index(spark, spark.createDataFrame(pdf), cfg, d, id_col="ext_id")
    pos = build_positions(
        spark, spark.createDataFrame(pdf), d, content_col="content", id_col="ext_id"
    )
    corpus = spark.createDataFrame(pdf[["ext_id", "content"]]).withColumnRenamed(
        "ext_id", "doc_id"
    )
    return idx, pos, corpus


def test_syntax_indexed_phrases_analyzed_adjacency(posidx):
    """search_syntax(positions=...) verifies exact phrases by the
    ANALYZED-ADJACENCY law (the reference runs PhraseQuery on the
    index): 'alpha.beta' matches '"alpha beta"' index-side though the
    verbatim-substring fallback rejects it."""
    idx, pos, corpus = posidx
    q = [(1, '"alpha beta" marker', 10)]
    indexed = search_syntax(idx, None, q, positions=pos).toPandas()
    assert sorted(indexed.doc_id) == [0, 1]  # adjacency in both
    fallback = search_syntax(idx, corpus, q).toPandas()
    assert sorted(fallback.doc_id) == [0]  # verbatim substring only
    # scores agree where both match (verification only filters)
    m = indexed.set_index("doc_id").score_q
    assert m[0] == fallback.set_index("doc_id").score_q[0]


def test_syntax_slop_backends_identical(posidx):
    """Sloppy phrases share one law: the positions backend and the
    stored-body _slop_match kernel return identical rows."""
    idx, pos, corpus = posidx
    q = [(1, '"alpha beta"~1 marker', 10), (2, '"beta gamma"~0', 10)]
    a = (
        search_syntax(idx, None, q, positions=pos)
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    b = (
        search_syntax(idx, corpus, q)
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_syntax_indexed_phrases_read_no_content(posidx):
    """Plan contract: with a positions backend no content column is
    scanned — at 100 TB stored bodies must never move for an indexed
    phrase (ChemicalIndex.java:482-485)."""
    from org_rdkit_lucene_spark.plans import audit

    idx, pos, _ = posidx
    df = search_syntax(
        idx, None, [(1, '"alpha beta" marker', 5), (2, '"alpha x"~2', 5)],
        positions=pos,
    )
    plan = audit.physical_plan(df)
    assert "content" not in plan
    assert audit.count_nodes(df, "BatchEvalPython") == 0


def test_positions_term_clustered_layout(spark, tmp_path):
    """Scale contract: the positions artifact is written TERM-CLUSTERED
    (repartition+sort by term, the postings law) so the pushed
    `term = w` predicate can skip row groups — corpus-order layout
    would make every phrase word re-read the whole token-volume table."""
    import glob as _glob

    import pyarrow.parquet as pq

    from org_rdkit_lucene_spark.operators.positions import build_positions
    from org_rdkit_lucene_spark.sources.fixtures import make_corpus_pdf

    pdf = make_corpus_pdf(n_docs=200, seed=5)
    pdf.insert(0, "ext_id", range(len(pdf)))
    d = str(tmp_path / "poslayout")
    import os as _os

    _os.makedirs(d, exist_ok=True)
    build_positions(
        spark, spark.createDataFrame(pdf), d, content_col="content", id_col="ext_id"
    )
    files = _glob.glob(_os.path.join(d, "positions.parquet", "*.parquet"))
    assert files
    n_rows = 0
    for fp in files:
        terms = pq.read_table(fp, columns=["term"]).column("term").to_pylist()
        n_rows += len(terms)
        assert terms == sorted(terms), f"{fp} not term-sorted"
    assert n_rows > 0


def test_phrase_bm25_scoring_law(spark, tmp_path):
    """PhraseQuery scoring analog: rank by BM25 over adjacency
    frequency — a doc with 2 phrase occurrences outranks 1 at equal
    length; longer docs are length-normalized down; score matches the
    hand-computed Okapi formula with lexicon idf."""
    import math

    from org_rdkit_lucene_spark.operators.build import build_index
    from org_rdkit_lucene_spark.operators.positions import (
        build_positions,
        search_phrase_bm25,
    )

    rows = []
    bodies = [
        "alpha beta gap alpha beta",        # f=2, dl=5
        "alpha beta gap gap gap",           # f=1, dl=5
        "alpha beta " + "pad " * 20,        # f=1, dl=22 (length-normalized down)
        "beta alpha gap gap gap",           # f=0
    ]
    for i, body in enumerate(bodies):
        rows.append((i, f"org/r{i}", f"src/f{i}.py", f"c{i:03d}", "py", body.strip()))
    pdf = pd.DataFrame(
        rows, columns=["ext_id", "repo", "path", "commit", "lang", "content"]
    )
    d = str(tmp_path / "pbm25")
    cfg = IndexConfig(build_partitions=2, hot_term_df=50, n_salts=2)
    idx = build_index(spark, spark.createDataFrame(pdf), cfg, d, id_col="ext_id")
    pos = build_positions(
        spark, spark.createDataFrame(pdf), d, content_col="content", id_col="ext_id"
    )
    out = (
        search_phrase_bm25(idx, pos, [(1, "alpha beta", 10)])
        .toPandas().sort_values("rank").reset_index(drop=True)
    )
    assert list(out.doc_id) == [0, 2, 1] or list(out.doc_id) == [0, 1, 2]
    assert out.iloc[0].doc_id == 0  # f=2 wins at equal dl
    # hand-compute doc 0: f=2, dl=5
    p = cfg.bm25
    lex = idx.lexicon.filter(F.col("term").isin(["alpha", "beta"])).toPandas()
    idf_sum = float(lex.idf.sum())
    dl, f_ = 5.0, 2.0
    want = idf_sum * f_ * (p.k1 + 1.0) / (f_ + p.k1 * (1 - p.b + p.b * dl / idx.avgdl))
    assert int(out.iloc[0].score_q) == math.floor(want * 10**p.score_decimals + 0.5)
    # longer doc with f=1 scores below the short f=1 doc
    s = out.set_index("doc_id").score_q
    assert s[1] > s[2]


def test_positions_packed_layout_and_view(spark, tmp_path):
    """The positions artifact is PACKED — one row per (term, doc) with
    the ASCENDING position list (the .prx posting shape) — and
    positions_view() explodes it back to exactly the analyzed
    (term, doc_id, pos) stream (the legacy posexplode law)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from org_rdkit_lucene_spark.functions.tokenizer import tokens_column
    from org_rdkit_lucene_spark.operators.positions import (
        build_positions,
        positions_view,
    )

    rows = [
        (0, "alpha beta alpha Gamma alpha"),
        (1, "beta beta"),
        (2, ""),  # tokenizes empty -> contributes nothing
    ]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "content"]))
    pos = build_positions(spark, docs, str(tmp_path / "packed"))
    assert pos.columns == ["term", "doc_id", "poss"]
    pdf = pos.toPandas()
    # one row per (term, doc) pair, each list strictly ascending
    assert not pdf.duplicated(subset=["term", "doc_id"]).any()
    for ps in pdf.poss:
        assert list(ps) == sorted(set(ps))
    assert sorted(
        pdf[pdf.term == "alpha"].apply(lambda r: (r.doc_id, list(r.poss)), axis=1)
    ) == [(0, [0, 2, 4])]
    # exploded view == the legacy posexplode law, exactly
    legacy = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.posexplode(tokens_column("content")).alias("pos", "term"),
    ).select("term", "doc_id", F.col("pos").cast("long").alias("pos"))
    got = {tuple(r) for r in positions_view(pos).collect()}
    want = {tuple(r) for r in legacy.collect()}
    assert got == want


def test_positions_legacy_flat_backcompat(spark, tmp_path):
    """A legacy FLAT (term, doc_id, pos) artifact — written by earlier
    engine versions — must keep working through every phrase surface:
    search/slop/ok-counts results identical to the packed artifact's
    (the on-the-fly _as_packed path)."""
    import pandas as pd

    from org_rdkit_lucene_spark.operators.positions import (
        build_positions,
        phrase_ok_counts,
        positions_view,
        search_phrase_positions,
        search_slop_positions,
    )

    rows = [
        (0, "alpha beta gamma alpha beta"),
        (1, "beta alpha beta gamma"),
        (2, "alpha x x beta"),
        (3, "echo echo echo"),
    ]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "content"]))
    packed = build_positions(spark, docs, str(tmp_path / "pk"))
    flat_dir = str(tmp_path / "flat_pos")
    positions_view(packed).write.parquet(flat_dir)
    flat = spark.read.parquet(flat_dir)
    assert "poss" not in flat.columns

    phrase_qs = [(1, "alpha beta", 10), (2, "echo echo", 10)]
    slop_qs = [(1, "alpha beta", 2, 10)]
    ok_rows = [(1, "alpha beta", 0), (1, "alpha beta", 2)]

    def srt(df):
        return sorted(tuple(r) for r in df.collect())

    assert srt(search_phrase_positions(flat, phrase_qs)) == srt(
        search_phrase_positions(packed, phrase_qs)
    )
    assert srt(search_slop_positions(flat, slop_qs)) == srt(
        search_slop_positions(packed, slop_qs)
    )
    assert srt(phrase_ok_counts(flat, ok_rows)) == srt(
        phrase_ok_counts(packed, ok_rows)
    )
    # and the packed results themselves are the known law outcome
    out = search_phrase_positions(packed, phrase_qs).toPandas()
    q1 = out[out.query_id == 1].sort_values("rank")
    assert list(zip(q1.doc_id, q1.n_occ)) == [(0, 2), (1, 1)]


def test_parse_field_phrases():
    """field:"a b"(~n) parses into field_phrases — previously this
    mis-split into a garbage field clause ('"src') plus a stray
    optional token ('util"')."""
    from org_rdkit_lucene_spark.operators.query import parse_query

    p = parse_query('path:"src util" alpha')
    assert p["field_phrases"] == [("path", "src util", 0)]
    assert p["optional"] == ["alpha"]
    assert p["fields"] == []
    p = parse_query('repo:"org acme"~2 -beta lang:"en"')
    assert ("repo", "org acme", 2) in p["field_phrases"]
    assert ("lang", "en", 0) in p["field_phrases"]
    assert p["excluded"] == ["beta"]
    # zero-token value is inert; plain quoted phrases stay content phrases
    p = parse_query('path:"//" "a b" x')
    assert p["field_phrases"] == []
    assert p["phrases"] == ["a b"]


def test_field_phrase_span_law(spark, tmp_path):
    """Field-scoped PhraseQuery law: adjacency and span over the FIELD
    token stream (lower+split, not the content analyzer), order
    matters, each matched clause adds FIELD_BOOST."""
    import math

    import pandas as pd

    from org_rdkit_lucene_spark.config import IndexConfig
    from org_rdkit_lucene_spark.operators.build import build_index
    from org_rdkit_lucene_spark.operators.query import FIELD_BOOST, search_syntax

    paths = [
        "src/util/a.py",      # 0: "src util" adjacent
        "src/b.py",           # 1
        "util/src/c.py",      # 2: reversed
        "src/x/util/d.py",    # 3: src..util span 2 (needs slop>=1)
    ]
    rows = [
        (i, "orgx", p, f"c{i}", "py", f"alpha doc{i}") for i, p in enumerate(paths)
    ]
    pdf = pd.DataFrame(
        rows, columns=["ext_id", "repo", "path", "commit", "lang", "content"]
    )
    d = str(tmp_path / "fp")
    cfg = IndexConfig(build_partitions=2, hot_term_df=50, n_salts=2)
    idx = build_index(spark, spark.createDataFrame(pdf), cfg, d, id_col="ext_id")

    out = search_syntax(idx, None, [(1, 'path:"src util"', 10)]).toPandas()
    assert sorted(out.doc_id) == [0]
    # pure field-phrase match scores exactly FIELD_BOOST (quantized)
    assert int(out.score_q.iloc[0]) == math.floor(
        FIELD_BOOST * 10 ** cfg.bm25.score_decimals + 0.5
    )
    out = search_syntax(idx, None, [(2, 'path:"src util"~1', 10)]).toPandas()
    assert sorted(out.doc_id) == [0, 3]
    out = search_syntax(idx, None, [(3, 'path:"util src"', 10)]).toPandas()
    assert sorted(out.doc_id) == [2]
    # repeated-word phrase: needs two occurrences in order
    out = search_syntax(idx, None, [(4, 'path:"src src"~8', 10)]).toPandas()
    assert len(out) == 0
    # single-word field phrase degenerates to token containment
    out = search_syntax(idx, None, [(5, 'path:"util"', 10)]).toPandas()
    assert sorted(out.doc_id) == [0, 2, 3]
    # two matching clauses accumulate 2x FIELD_BOOST
    out = search_syntax(
        idx, None, [(6, 'path:"src util" repo:"orgx"', 10)]
    ).toPandas().sort_values("rank")
    assert int(out.iloc[0].doc_id) == 0
    assert int(out.iloc[0].score_q) == math.floor(
        2 * FIELD_BOOST * 10 ** cfg.bm25.score_decimals + 0.5
    )


def test_positions_nondefault_profile_parity(spark, tmp_path):
    """A non-default analyzer profile (char-ngram — outside the Arrow
    fast path's gate) must build positions through the canonical pandas
    pipeline and still equal the Catalyst posexplode law exactly; the
    phrase law then runs over n-gram tokens."""
    import pandas as pd
    from pyspark.sql import functions as F

    from org_rdkit_lucene_spark.config import TokenizerProfile
    from org_rdkit_lucene_spark.functions.tokenizer import tokens_column
    from org_rdkit_lucene_spark.operators.positions import (
        build_positions,
        positions_view,
        search_phrase_positions,
    )

    prof = TokenizerProfile(name="trigram", char_ngram=3)
    assert not prof.arrow_fast_path_ok
    rows = [(0, "alphabet soup"), (1, "alp habet"), (2, None)]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "content"]))
    pos = build_positions(spark, docs, str(tmp_path / "tri"), profile=prof)
    got = {tuple(r) for r in positions_view(pos).collect()}
    legacy = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.posexplode(tokens_column("content", prof)).alias("pos", "term"),
    ).select("term", "doc_id", F.col("pos").cast("long").alias("pos"))
    want = {tuple(r) for r in legacy.collect()}
    assert got == want and got
    # phrase over the n-gram stream: "alphabet" -> [alp, lph, pha, ...]
    out = search_phrase_positions(pos, [(1, "alphabet", 5)], profile=prof).toPandas()
    assert list(out.doc_id) == [0]


def test_field_clause_boosts_stripped():
    """QueryParser accepts boosts on field clauses and field phrases;
    the engine's field clauses carry the fixed FIELD_BOOST, so the
    boost is stripped rather than leaving a 'value^2' literal that can
    never match a field token (and the stray '^2' never leaks into the
    scoring terms)."""
    from org_rdkit_lucene_spark.operators.query import parse_query

    p = parse_query('path:src^2 repo:(a b^3) lang:"en"^2 path:"x y"~1^3 alpha')
    assert ("path", "src") in p["fields"]
    assert ("repo", "a") in p["fields"] and ("repo", "b") in p["fields"]
    assert ("lang", "en", 0) in p["field_phrases"]
    assert ("path", "x y", 1) in p["field_phrases"]
    assert p["optional"] == ["alpha"]


def test_parse_field_expansions():
    """Field-scoped Prefix/Wildcard/FuzzyQuery surface
    (MultiFieldQueryParser rewrites path:util* per field,
    ChemicalIndex.java:482-485) — previously these were swallowed into
    a never-matching field literal (the round-4 field-phrase bug
    class)."""
    from org_rdkit_lucene_spark.operators.query import parse_query

    p = parse_query("path:util* repo:s?ark lang:pyth~ path:a*b lang:go~2 x")
    assert p["field_prefixes"] == [("path", "util")]
    assert sorted(p["field_wildcards"]) == [("path", "a*b"), ("repo", "s?ark")]
    assert sorted(p["field_fuzzies"]) == [("lang", "go", 2), ("lang", "pyth", 1)]
    assert p["fields"] == []
    assert p["optional"] == ["x"]
    # plain field values and boosted values are untouched
    p = parse_query("path:plain repo:r^2")
    assert sorted(p["fields"]) == [("path", "plain"), ("repo", "r")]
    assert not (p["field_prefixes"] or p["field_wildcards"] or p["field_fuzzies"])
    # leading wildcard in a field value degrades to a (never-matching)
    # literal, same allowLeadingWildcard=false law as content clauses
    p = parse_query("path:*util")
    assert p["fields"] == [("path", "*util")]
    assert not p["field_wildcards"]
    # fuzzy dist clamps to FUZZY_MAX_DIST
    p = parse_query("lang:py~9")
    assert p["field_fuzzies"] == [("lang", "py", 2)]


def test_parse_field_ranges_and_regexps():
    """field:[a TO b] (field TermRangeQuery) and field:/pat/ (field
    RegexpQuery) complete the field-clause matrix — previously the
    range left a dangling 'path:' token and the regexp became a
    never-matching field literal."""
    from org_rdkit_lucene_spark.operators.query import parse_query

    p = parse_query("path:[abc TO util] -lang:{a TO c}^2 x repo:[m TO *}")
    assert p["field_ranges"] == [
        ("path", "abc", "util", True, True),
        ("lang", "a", "c", False, False),
        ("repo", "m", None, True, False),
    ]
    assert p["field_range_boosts"] == [1.0, 2.0, 1.0]
    assert p["optional"] == ["x"]  # the '-' sign was consumed
    assert p["excluded"] == [] and p["ranges"] == []
    # field:[* TO *] is inert, like the content form
    q = parse_query("path:[* TO *] alpha")
    assert q["field_ranges"] == [] and q["optional"] == ["alpha"]
    # field regexp: portable-subset patterns parse, invalid ones
    # degrade to a field literal (same law as content /pat/)
    r = parse_query("path:/ut.l/ lang:/py(thon)?/^3 repo:/bad(/")
    assert r["field_regexps"] == [("path", "ut.l"), ("lang", "py(thon)?")]
    assert r["field_regexp_boosts"] == [1.0, 3.0]
    assert r["fields"] == [("repo", "/bad(/")]
    # content ranges and regexps are untouched by the field forms
    s = parse_query("[a TO m] /sc.n/")
    assert s["ranges"] == [("a", "m", True, True)]
    assert s["regexps"] == ["sc.n"]
    assert s["field_ranges"] == [] and s["field_regexps"] == []


def test_field_phrase_sign_consumed():
    """-path:"a b" / +path:"a b": the sign is CONSUMED by the pre-pass
    (all field-clause forms are SHOULD-only, documented) — no stray
    '-' token leaks into the optional terms."""
    from org_rdkit_lucene_spark.operators.query import parse_query

    p = parse_query('-path:"src util" +repo:"org acme" alpha')
    assert ("path", "src util", 0) in p["field_phrases"]
    assert ("repo", "org acme", 0) in p["field_phrases"]
    assert p["optional"] == ["alpha"]
    assert p["required"] == [] and p["excluded"] == []


def test_field_expansion_law(spark, tmp_path):
    """Field expansion clauses match over the FIELD token law (any
    token matches the anchored pattern / edit-distance ball), each
    matched clause adds exactly one FIELD_BOOST."""
    import math

    from org_rdkit_lucene_spark.config import IndexConfig
    from org_rdkit_lucene_spark.operators.build import build_index
    from org_rdkit_lucene_spark.operators.query import FIELD_BOOST, search_syntax

    rows = [
        (0, "orgx", "src/utility/a.py", "c0", "python", "alpha doc0"),
        (1, "orgx", "src/b.py", "c1", "java", "alpha doc1"),
        (2, "orgx", "util/c.py", "c2", "python", "alpha doc2"),
        (3, "orgy", "tools/d.py", "c3", "go", "alpha doc3"),
    ]
    pdf = pd.DataFrame(
        rows, columns=["ext_id", "repo", "path", "commit", "lang", "content"]
    )
    cfg = IndexConfig(build_partitions=2, hot_term_df=50, n_salts=2)
    idx = build_index(
        spark, spark.createDataFrame(pdf), cfg, str(tmp_path / "fx"), id_col="ext_id"
    )
    unit = math.floor(FIELD_BOOST * 10 ** cfg.bm25.score_decimals + 0.5)

    # prefix: util* matches 'utility' (doc 0) and 'util' (doc 2)
    out = search_syntax(idx, None, [(1, "path:util*", 10)]).toPandas()
    assert sorted(out.doc_id) == [0, 2]
    assert set(out.score_q) == {unit}
    # wildcard: p?thon matches lang python (docs 0 and 2)
    out = search_syntax(idx, None, [(2, "lang:p?thon", 10)]).toPandas()
    assert sorted(out.doc_id) == [0, 2]
    # fuzzy: pythn~1 matches python (0) and python (2), not java/go
    out = search_syntax(idx, None, [(3, "lang:pythn~", 10)]).toPandas()
    assert sorted(out.doc_id) == [0, 2]
    # two clauses matching the same doc accumulate 2x FIELD_BOOST
    out = (
        search_syntax(idx, None, [(4, "path:util* lang:pyth~2", 10)])
        .toPandas()
        .sort_values("rank")
    )
    assert int(out.iloc[0].doc_id) == 0
    assert int(out.iloc[0].score_q) == 2 * unit
    # field expansion composes with BM25 terms (SHOULD union)
    out = search_syntax(idx, None, [(5, "doc3 repo:orgy*", 10)]).toPandas()
    assert sorted(out.doc_id) == [3]
    assert int(out.score_q.iloc[0]) > unit
    # field range: lang tokens in [go TO java] — go (3), java (1);
    # exclusive upper {go TO java} drops java
    out = search_syntax(idx, None, [(6, "lang:[go TO java]", 10)]).toPandas()
    assert sorted(out.doc_id) == [1, 3]
    out = search_syntax(idx, None, [(7, "lang:[go TO java}", 10)]).toPandas()
    assert sorted(out.doc_id) == [3]
    # open upper bound: path tokens >= utility (doc 0 'utility')
    out = search_syntax(idx, None, [(8, "path:[utility TO *]", 10)]).toPandas()
    assert 0 in set(out.doc_id)
    # field regexp: anchored full-token law — /utilit./ matches
    # 'utility' (doc 0) but NOT 'util' (doc 2)
    out = search_syntax(idx, None, [(9, "path:/utilit./", 10)]).toPandas()
    assert sorted(out.doc_id) == [0]
    out = search_syntax(idx, None, [(10, "lang:/(python|go)/", 10)]).toPandas()
    assert sorted(out.doc_id) == [0, 2, 3]


def test_field_expansion_oracle_parity(spark, tmp_path):
    """Engine vs DuckDB twin on field-scoped expansions, using the
    documents-table field mapping (repo→source, path→source||/doc/||id,
    lang→lang) — the exact shape the driver gate runs."""
    import duckdb

    from org_rdkit_lucene_spark.config import IndexConfig
    from org_rdkit_lucene_spark.operators.build import build_index
    from org_rdkit_lucene_spark.operators.query import search_syntax
    from org_rdkit_lucene_spark.oracle.sqlgen import query_syntax_sql

    docs = pd.DataFrame(
        {
            "doc_id": range(6),
            "text": [
                "merge sort quick", "binary search tree", "merge conflict",
                "hash map util", "sorted list merge", "tree walk",
            ],
            "source": ["github", "gitlab", "github", "internal", "webcrawl", "github"],
            "lang": ["python", "java", "python", "go", "rust", "java"],
        }
    )
    corpus = spark.createDataFrame(docs).select(
        F.col("source").alias("repo"),
        F.concat_ws("/", F.col("source"), F.lit("doc"), F.col("doc_id")).alias("path"),
        F.col("doc_id").cast("string").alias("commit"),
        "lang",
        F.col("text").alias("content"),
        F.col("doc_id").alias("ext_id"),
    )
    cfg = IndexConfig(build_partitions=2, hot_term_df=50, n_salts=2)
    idx = build_index(
        spark, corpus, cfg, str(tmp_path / "fxo"), id_col="ext_id"
    )
    queries = [
        (1, "merge repo:git* lang:jav~", 10),
        (2, "path:d?c lang:pyth~2 tree", 10),
        (3, "repo:inter* repo:web*", 10),
        (4, "lang:[go TO python} sort repo:{git TO gitlab]", 10),
        (5, "lang:/ja.a/ path:/doc/ -tree", 10),
        (6, 'lang:[java TO rust]^2 repo:/git(hub)?/^3 merge', 10),
    ]
    got = (
        search_syntax(idx, None, queries)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", docs)
    want = (
        con.execute(query_syntax_sql(queries))
        .df()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert list(got.doc_id) == list(want.doc_id)
    assert list(got.score_q) == list(want.score_q)
    assert len(got) > 0


def test_search_after_syntax_identity(small_index, syn_corpus):
    """searchAfter over the FULL syntax surface: page1 + page2 ==
    top-2k (paging is query-agnostic in the reference collectors,
    SubstructureScoreDocCollector.java:97-160)."""
    text = "merg +scor path:src index*"
    full = (
        search_syntax(small_index, syn_corpus, [(1, text, 20)])
        .toPandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    assert len(full) >= 12
    page1 = full.iloc[:10]
    last = page1.iloc[-1]
    page2 = (
        search_syntax(
            small_index, syn_corpus, [(1, text, 10)],
            after={1: (int(last.score_q), int(last.doc_id))},
        )
        .toPandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    want2 = full.iloc[10:20].reset_index(drop=True)
    assert list(page2.doc_id) == list(want2.doc_id)
    assert list(page2.score_q) == list(want2.score_q)


def test_clause_boosts_all_forms_oracle_parity(spark, tmp_path):
    """setBoost on EVERY clause form (phrase, slop phrase, field,
    field phrase, field expansion, prefix/wildcard/fuzzy/range/regexp):
    engine == DuckDB twin hash-identically; duplicate clauses' boosts
    SUM (_clause_weights); boost on an excluded clause is inert."""
    import duckdb

    from org_rdkit_lucene_spark.config import IndexConfig
    from org_rdkit_lucene_spark.operators.build import build_index
    from org_rdkit_lucene_spark.operators.query import search_syntax
    from org_rdkit_lucene_spark.oracle.sqlgen import query_syntax_sql

    docs = pd.DataFrame(
        {
            "doc_id": range(6),
            "text": [
                "merge sort quick", "binary search tree", "merge conflict zone",
                "hash map util", "sorted list merge", "tree walk search",
            ],
            "source": ["github", "gitlab", "github", "internal", "webcrawl", "github"],
            "lang": ["python", "java", "python", "go", "rust", "java"],
        }
    )
    corpus = spark.createDataFrame(docs).select(
        F.col("source").alias("repo"),
        F.concat_ws("/", F.col("source"), F.lit("doc"), F.col("doc_id")).alias("path"),
        F.col("doc_id").cast("string").alias("commit"),
        "lang",
        F.col("text").alias("content"),
        F.col("doc_id").alias("ext_id"),
    )
    cfg = IndexConfig(build_partitions=2, hot_term_df=50, n_salts=2)
    idx = build_index(spark, corpus, cfg, str(tmp_path / "bo"), id_col="ext_id")
    corpus_ids = corpus.withColumnRenamed("ext_id", "doc_id")
    queries = [
        (1, 'merge^3 tree', 10),
        (2, 'mer*^2 search', 10),            # boosted prefix expansion
        (3, 'merge repo:git*^2 lang:jav~^3', 10),  # boosted field expansions
        (4, 'path:d?c^2 sort', 10),           # boosted field wildcard
        (5, 'tre?^2 walk', 10),               # boosted content wildcard
        (6, 'mergd~^2 quick', 10),            # boosted fuzzy
        (7, '[sa TO sz]^2 hash', 10),         # boosted range
        (8, 'sort^2 sort^3 merge', 10),       # duplicate boosts sum
        (9, 'merge -quick^5', 10),            # boost on MUST_NOT inert
        (10, 'lang:python^4 walk', 10),       # boosted field literal
    ]
    got = (
        search_syntax(idx, corpus_ids, queries)
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", docs)
    want = (
        con.execute(query_syntax_sql(queries))
        .df().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    assert list(got.query_id) == list(want.query_id)
    assert list(got.doc_id) == list(want.doc_id)
    assert list(got.score_q) == list(want.score_q)
    assert len(got) > 0
    # phrase boost pins its tokens at the boost: engine == twin again
    pq = [(11, '"merge sort"^2 quick', 10), (12, '"sorted list"~1^3', 10)]
    got2 = (
        search_syntax(idx, corpus_ids, pq)
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    want2 = (
        con.execute(query_syntax_sql(pq))
        .df().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    assert list(got2.doc_id) == list(want2.doc_id)
    assert list(got2.score_q) == list(want2.score_q)
    assert len(got2) > 0
