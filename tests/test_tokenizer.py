"""Tokenizer golden cases + three-way implementation parity
(pandas canonical / Spark built-in expressions / DuckDB SQL)."""

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from org_rdkit_lucene_spark.config import TokenizerProfile
from org_rdkit_lucene_spark.functions.tokenizer import (
    duckdb_tokens_sql,
    tokenize_text,
    tokenize_texts,
    tokens_column,
)

GOLDEN = [
    ("getHTTPServerURL", ["get", "http", "server", "url"]),
    ("snake_case_id", ["snake", "case", "id"]),
    ("Foo2Bar", ["foo2", "bar"]),
    ("parseJSON2xml", ["parse", "json2xml"]),
    ("", []),
    (None, []),
    ("x.y.z->q", ["x", "y", "z", "q"]),
    ("UPPER_CASE_99", ["upper", "case", "99"]),
    ("a" * 65, []),  # over max_token_len
    ("mixedCASE123abc", ["mixed", "case123abc"]),
]


def test_golden_scalar():
    for text, want in GOLDEN:
        assert tokenize_text(text) == want, text


def test_pandas_matches_scalar():
    s = pd.Series([t for t, _ in GOLDEN])
    got = list(tokenize_texts(s))
    assert got == [w for _, w in GOLDEN]


def _random_code_strings(n=300, seed=7):
    rng = np.random.default_rng(seed)
    alphabet = list("abcXYZ_09.->(){}\n\t éÜ$#")
    return [
        "".join(rng.choice(alphabet, size=int(rng.integers(0, 80))))
        for _ in range(n)
    ]


def test_duckdb_parity_randomized():
    texts = _random_code_strings()
    want = list(tokenize_texts(pd.Series(texts)))
    expr = duckdb_tokens_sql("t")
    got = [r[0] for r in duckdb.sql(
        f"select {expr} from (select unnest($1) as t)", params=[texts]
    ).fetchall()]
    assert got == want


def test_spark_parity_randomized(spark):
    texts = _random_code_strings()
    df = spark.createDataFrame(pd.DataFrame({"t": texts}))
    got = [r["toks"] for r in df.select(tokens_column("t").alias("toks")).collect()]
    want = list(tokenize_texts(pd.Series(texts)))
    assert got == want


def test_arrow_fast_path_parity_randomized():
    """The ASCII Arrow fast path (build kernel) must be byte-identical
    to the canonical pandas pipeline on ASCII input."""
    from org_rdkit_lucene_spark.functions.tokenizer import (
        batch_is_ascii,
        tokenize_flat_arrow_ascii,
    )

    texts = [t for t in _random_code_strings(seed=11) if t.isascii()]
    texts += [t for t, _ in GOLDEN if t is not None and t.isascii()]
    s = pd.Series(texts)
    assert batch_is_ascii(s)
    doc_idx, flat, counts = tokenize_flat_arrow_ascii(s)
    want = list(tokenize_texts(s))
    assert flat.to_pandas().tolist() == [t for xs in want for t in xs]
    assert counts.tolist() == [len(xs) for xs in want]
    # doc_idx maps each flat token to its row, in row order
    assert (np.sort(doc_idx) == doc_idx).all()


def test_batch_is_ascii_gate():
    from org_rdkit_lucene_spark.functions.tokenizer import batch_is_ascii

    assert batch_is_ascii(pd.Series(["abc", "", None]))
    assert not batch_is_ascii(pd.Series(["abc", "Üben"]))


def test_ngram_profile():
    p = TokenizerProfile(name="ngram2", ngram=2)
    assert tokenize_text("fooBar baz", p) == ["foo", "bar", "baz", "foo␟bar", "bar␟baz"]


def test_profile_validation():
    with pytest.raises(ValueError):
        TokenizerProfile(min_token_len=0)
    with pytest.raises(ValueError):
        TokenizerProfile(min_token_len=5, max_token_len=2)
    with pytest.raises(ValueError):
        TokenizerProfile(ngram=2, char_ngram=3)  # mutually exclusive


# ---------------------------------------------------------------------------
# Analyzer registry (T3): every named profile must hold three-way
# parity (pandas canonical / Catalyst / DuckDB SQL)


def test_analyzer_registry():
    from org_rdkit_lucene_spark.config import ANALYZERS, get_analyzer

    assert set(ANALYZERS) == {"code_default", "identifiers_only", "trigram", "english_stop"}
    assert get_analyzer("trigram").char_ngram == 3
    with pytest.raises(ValueError, match="unknown analyzer"):
        get_analyzer("nope")


def test_identifiers_only_golden():
    from org_rdkit_lucene_spark.config import get_analyzer

    p = get_analyzer("identifiers_only")
    assert tokenize_text("x99 foo 1234 a UPPER_CASE_99", p) == ["x99", "foo", "upper", "case"]


def test_english_stop_golden():
    """StopFilter law: classic English stop set dropped AFTER the
    length filter, BEFORE n-gram stages; code identifiers survive."""
    from org_rdkit_lucene_spark.config import TokenizerProfile, get_analyzer

    p = get_analyzer("english_stop")
    assert tokenize_text("the getIndexValue of a scorer", p) == [
        "get", "index", "value", "scorer"
    ]
    # stopwords must be lowercase when the profile lowercases
    with pytest.raises(ValueError, match="stopword"):
        TokenizerProfile(stopwords=("The",))
    with pytest.raises(ValueError, match="stopword"):
        TokenizerProfile(stopwords=("",))


def test_trigram_golden():
    from org_rdkit_lucene_spark.config import get_analyzer

    p = get_analyzer("trigram")
    assert tokenize_text("getURL ab", p) == ["get", "url", "ab"]
    assert tokenize_text("parse", p) == ["par", "ars", "rse"]


@pytest.mark.parametrize(
    "profile_name", ["identifiers_only", "trigram", "ngram2", "english_stop"]
)
def test_profile_three_way_parity(spark, profile_name):
    from org_rdkit_lucene_spark.config import get_analyzer

    p = (TokenizerProfile(name="ngram2", ngram=2) if profile_name == "ngram2"
         else get_analyzer(profile_name))
    texts = _random_code_strings(seed=23)
    texts += [t for t, _ in GOLDEN if t is not None]
    want = list(tokenize_texts(pd.Series(texts), p))
    # scalar canonical
    assert [tokenize_text(t, p) for t in texts] == want
    # Catalyst
    df = spark.createDataFrame(pd.DataFrame({"t": texts}))
    got_spark = [r["toks"] for r in df.select(tokens_column("t", p).alias("toks")).collect()]
    assert got_spark == want
    # DuckDB
    expr = duckdb_tokens_sql("t", p)
    got_duck = [r[0] for r in duckdb.sql(
        f"select {expr} from (select unnest($1) as t)", params=[texts]
    ).fetchall()]
    assert got_duck == want


def test_arrow_fast_path_rejects_non_default_profiles():
    from org_rdkit_lucene_spark.config import get_analyzer
    from org_rdkit_lucene_spark.functions.tokenizer import tokenize_flat_arrow_ascii

    for name in ("identifiers_only", "trigram", "english_stop"):
        p = get_analyzer(name)
        assert not p.arrow_fast_path_ok
        with pytest.raises(ValueError):
            tokenize_flat_arrow_ascii(pd.Series(["abc"]), p)
