"""Code-aware tokenizer — the engine's term extractor.

Reference analog: the fingerprint pipeline that turns a molecule into
index terms (``fingerprint/DefaultFingerprintFactory.java:142-224``; term
emission per set bit at ``ChemicalIndex.java:822-825``). Here the "terms"
of a source-code document are its identifier sub-words:

    pipeline:  camelCase split  →  lowercase  →  split on [^a-z0-9]+
               (underscores are separators ⇒ snake_case splits for free)
               →  drop empty / over-long tokens

Three provably-identical implementations are exported (tests assert
agreement on golden + randomized inputs):

- :func:`tokenize_texts` — pure pandas/numpy, the CANONICAL definition;
  used by the brute-force oracle and wrapped as a vectorized
  ``pandas_udf`` (Arrow batches, no per-row Python).
- :func:`tokens_column` — the same pipeline as built-in Catalyst
  expressions (``regexp_replace``/``lower``/``split``/``filter``) so the
  hot build path stays inside whole-stage codegen, JVM-side.
- :func:`duckdb_tokens_sql` — the same pipeline as a DuckDB SQL
  fragment, used by ``oracle_sql()`` so the driver's DuckDB check runs
  the identical tokenization.

Doc/query asymmetry (reference: query fingerprint uses different flags,
``LuceneBenchmark.java:589-599``): both sides share this pipeline; the
query side may additionally deduplicate terms (conjunctive semantics),
handled in the query planner, not here.
"""

from __future__ import annotations

import re
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from org_rdkit_lucene_spark.config import TokenizerProfile

# Order matters: ALLCAPS-run boundary first ("HTTPServer" -> "HTTP Server"),
# then lower/digit→upper boundary ("camelCase" -> "camel Case").
_CAMEL1 = r"([A-Z]+)([A-Z][a-z])"
_CAMEL2 = r"([a-z0-9])([A-Z])"
_SEP = r"[^a-z0-9]+"

_CAMEL1_RE = re.compile(_CAMEL1)
_CAMEL2_RE = re.compile(_CAMEL2)
_SEP_RE = re.compile(_SEP)

DEFAULT_PROFILE = TokenizerProfile()


_NUMERIC_RE = re.compile(r"^[0-9]+$")


def _char_ngrams(tok: str, n: int) -> list[str]:
    """Character n-grams of one token; shorter tokens pass through."""
    return [tok[i : i + n] for i in range(max(1, len(tok) - n + 1))]


def tokenize_text(text: str | None, profile: TokenizerProfile = DEFAULT_PROFILE) -> list[str]:
    """Tokenize one string (canonical scalar definition)."""
    if text is None:
        return []
    s = text
    if profile.split_camel_case:
        s = _CAMEL1_RE.sub(r"\1 \2", s)
        s = _CAMEL2_RE.sub(r"\1 \2", s)
    if profile.lowercase:
        s = s.lower()
    toks = [t for t in _SEP_RE.split(s) if profile.min_token_len <= len(t) <= profile.max_token_len]
    if profile.drop_numeric:
        toks = [t for t in toks if not _NUMERIC_RE.match(t)]
    if profile.stopwords:
        stops = set(profile.stopwords)
        toks = [t for t in toks if t not in stops]
    if profile.char_ngram > 0:
        toks = [g for t in toks for g in _char_ngrams(t, profile.char_ngram)]
    if profile.ngram > 1:
        n = profile.ngram
        toks = toks + ["␟".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    return toks


def tokenize_texts(
    texts: pd.Series, profile: TokenizerProfile = DEFAULT_PROFILE
) -> pd.Series:
    """Vectorized tokenize: Series[str] -> Series[list[str]]."""
    s = texts.fillna("")
    if profile.split_camel_case:
        s = s.str.replace(_CAMEL1_RE, r"\1 \2", regex=True)
        s = s.str.replace(_CAMEL2_RE, r"\1 \2", regex=True)
    if profile.lowercase:
        s = s.str.lower()
    lo, hi = profile.min_token_len, profile.max_token_len
    out = s.str.split(_SEP_RE).map(lambda xs: [t for t in xs if lo <= len(t) <= hi])
    if profile.drop_numeric:
        out = out.map(lambda ts: [t for t in ts if not _NUMERIC_RE.match(t)])
    if profile.stopwords:
        stops = set(profile.stopwords)
        out = out.map(lambda ts: [t for t in ts if t not in stops])
    if profile.char_ngram > 0:
        cn = profile.char_ngram
        out = out.map(lambda ts: [g for t in ts for g in _char_ngrams(t, cn)])
    if profile.ngram > 1:
        n = profile.ngram
        out = out.map(
            lambda ts: ts + ["␟".join(ts[i : i + n]) for i in range(len(ts) - n + 1)]
        )
    return out


def make_tokenize_udf(profile: TokenizerProfile = DEFAULT_PROFILE):
    """Arrow-vectorized pandas UDF: string column -> array<string> terms."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _tok(s: pd.Series) -> pd.Series:
        return tokenize_texts(s, profile)

    return _tok


def tokens_column(col: Column | str, profile: TokenizerProfile = DEFAULT_PROFILE) -> Column:
    """Same pipeline as built-in Catalyst expressions (JVM, codegen'd).

    Used on the hot build path — faster than the Arrow round-trip.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.coalesce(c, F.lit(""))
    if profile.split_camel_case:
        c = F.regexp_replace(c, _CAMEL1, r"$1 $2")
        c = F.regexp_replace(c, _CAMEL2, r"$1 $2")
    if profile.lowercase:
        c = F.lower(c)
    arr = F.split(c, _SEP)
    lo, hi = profile.min_token_len, profile.max_token_len
    arr = F.filter(arr, lambda t: (F.length(t) >= lo) & (F.length(t) <= hi))
    if profile.drop_numeric:
        arr = F.filter(arr, lambda t: ~t.rlike("^[0-9]+$"))
    if profile.stopwords:
        stops = list(profile.stopwords)
        arr = F.filter(arr, lambda t: ~t.isin(stops))
    if profile.char_ngram > 0:
        n = profile.char_ngram
        arr = F.flatten(
            F.transform(
                arr,
                lambda t: F.when(F.length(t) <= n, F.array(t)).otherwise(
                    F.transform(
                        F.sequence(F.lit(1), F.length(t) - (n - 1)),
                        lambda i: t.substr(i, F.lit(n)),
                    )
                ),
            )
        )
    if profile.ngram > 1:
        n = profile.ngram
        # token array BOUND once (bind_array): slicing the unbound
        # split/filter chain inside the per-gram transform re-runs it
        # per gram position
        arr = bind_array(
            arr,
            lambda a: F.concat(
                a,
                F.when(F.size(a) < n, F.array().cast("array<string>")).otherwise(
                    F.transform(
                        F.sequence(F.lit(1), F.size(a) - (n - 1)),
                        lambda i: F.array_join(F.slice(a, i, n), "␟"),
                    )
                ),
            ),
        )
    return arr


def duckdb_tokens_sql(col_sql: str, profile: TokenizerProfile = DEFAULT_PROFILE) -> str:
    """Emit a DuckDB SQL expression producing the identical token list.

    Lets ``oracle_sql()`` run the same tokenization so the driver's
    DuckDB-vs-Spark comparison checks semantics, not tokenizer drift.
    """
    c = f"coalesce({col_sql}, '')"
    if profile.split_camel_case:
        c = f"regexp_replace({c}, '{_CAMEL1}', '\\1 \\2', 'g')"
        c = f"regexp_replace({c}, '{_CAMEL2}', '\\1 \\2', 'g')"
    if profile.lowercase:
        c = f"lower({c})"
    lo, hi = profile.min_token_len, profile.max_token_len
    arr = (
        f"list_filter(regexp_split_to_array({c}, '{_SEP}'), "
        f"t -> len(t) >= {lo} AND len(t) <= {hi})"
    )
    if profile.drop_numeric:
        arr = f"list_filter({arr}, t -> NOT regexp_matches(t, '^[0-9]+$'))"
    if profile.stopwords:
        inlist = ", ".join(
            "'" + w.replace("'", "''") + "'" for w in profile.stopwords
        )
        arr = f"list_filter({arr}, t -> t NOT IN ({inlist}))"
    if profile.char_ngram > 0:
        n = profile.char_ngram
        arr = (
            f"flatten(list_transform({arr}, t -> "
            f"CASE WHEN len(t) <= {n} THEN [t] "
            f"ELSE list_transform(range(1, len(t) - {n - 2}), i -> substr(t, i, {n})) END))"
        )
    if profile.ngram > 1:
        n = profile.ngram
        arr = (
            f"list_concat({arr}, "
            f"CASE WHEN len({arr}) < {n} THEN CAST([] AS VARCHAR[]) "
            f"ELSE list_transform(range(1, len({arr}) - {n - 2}), "
            f"i -> array_to_string(({arr})[i:i+{n - 1}], '␟')) END)"
        )
    return arr


def tokenize_flat_arrow_ascii(
    texts: pd.Series, profile: TokenizerProfile = DEFAULT_PROFILE
):
    """Arrow-native flat tokenization for ASCII batches — the build
    kernel's fast path.

    Runs the IDENTICAL pipeline (camel regexes → lower → sep-split →
    length filter) entirely in Arrow C++ kernels (RE2 + utf8), so no
    per-token Python objects are created — the allocation churn of 8M
    PyObjects per batch is what throttles multi-worker scaling. Output
    is byte-identical to :func:`tokenize_texts` for ASCII input
    (asserted in tests); callers MUST gate on ASCII-ness (Unicode
    lower/regex edge semantics are only guaranteed by the canonical
    pandas path).

    Returns ``(doc_idx, flat)``: int64 row index per token and the flat
    Arrow string array of tokens, plus per-row token counts.

    ``texts`` may be a pandas Series OR an Arrow array (the mapInArrow
    packers pass record-batch columns straight through — no pandas
    round-trip); both run the identical kernels.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if not profile.arrow_fast_path_ok:
        raise ValueError("profile not supported by the Arrow fast path")
    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        arr = pc.cast(pc.fill_null(texts, ""), pa.large_string())
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
    else:
        arr = pa.array(texts.fillna(""), type=pa.large_string())
    s = arr
    if profile.split_camel_case:
        s = pc.replace_substring_regex(s, pattern=_CAMEL1, replacement=r"\1 \2")
        s = pc.replace_substring_regex(s, pattern=_CAMEL2, replacement=r"\1 \2")
    if profile.lowercase:
        s = pc.utf8_lower(s)
    lists = pc.split_pattern_regex(s, pattern=_SEP)
    flat = pc.list_flatten(lists)
    parent = pc.list_parent_indices(lists).to_numpy().astype(np.int64)
    ln = pc.utf8_length(flat).to_numpy()
    mask = (ln >= profile.min_token_len) & (ln <= profile.max_token_len)
    doc_idx = parent[mask]
    flat = flat.filter(pa.array(mask))
    counts = np.bincount(doc_idx, minlength=len(texts)).astype(np.int64)
    return doc_idx, flat, counts


def batch_is_ascii(texts) -> bool:
    """True when every string in the batch is pure ASCII. Accepts a
    pandas Series or an Arrow array/chunked array."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        arr = pc.fill_null(texts, "")
    else:
        arr = pa.array(texts.fillna(""), type=pa.large_string())
    ok = pc.all(pc.string_is_ascii(arr))
    return bool(ok.as_py())


def tokenize_query_terms(
    queries: Iterable[str], profile: TokenizerProfile = DEFAULT_PROFILE
) -> list[list[str]]:
    """Driver-side query tokenization (query sets are small — reference
    parses queries on the caller thread too, ``ChemicalIndex.java:618``)."""
    return [tokenize_text(q, profile) for q in queries]


def bind_array(arr: Column, fn) -> Column:
    """Evaluate ``arr`` ONCE per row and pass the bound VALUE into
    ``fn`` — Catalyst binds a higher-order function's lambda argument
    as a NamedLambdaVariable (a value), whereas a plain column
    reference splices the whole expression TREE, which codegen then
    re-evaluates at every reference. Referencing a derived array (the
    tokenizer chain, a per-token hash array, a sorted copy) inside a
    per-element ``transform`` lambda therefore re-runs the derivation
    per element — measured 15× on the shingle explode at sf0.1 (and
    quadratic for rolling-window minima). Wrapping as
    ``transform(array(arr), a -> fn(a))[1]`` keeps everything a pure
    expression (no exchange, no projection barrier) with ``arr``
    evaluated exactly once."""
    return F.element_at(F.transform(F.array(arr), fn), 1)
