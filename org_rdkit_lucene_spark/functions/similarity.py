"""Pluggable similarities — the Lucene ``Similarity`` surface.

The reference engine scores through Lucene's pluggable ``Similarity``
(``IndexSearcher.setSimilarity``; the reference keeps the default
``BM25Similarity``, ``ChemicalIndex.java:launchSearcher``). This module
re-expresses that pluggability Spark-first: a similarity is a pair of
laws —

- a DRIVER law (:meth:`Similarity.driver_cols`): per-(query, term)
  constants computed once from the metadata-sized lexicon slice
  (qtf, df, cf, idf are all per-term scalars), shipped on the same
  broadcast the BM25 path already pays. Nothing per-doc happens here.
- an EXECUTOR law (:meth:`Similarity.contrib_expr`): a pure-Catalyst
  column over the hot decoded-postings stream's ``tf``/``dl`` columns
  plus the broadcast constants. No UDF, so every similarity scores
  inside whole-stage codegen exactly like the default BM25 expression.

Scores from every similarity ride the SAME downstream laws as BM25:
float64 sum per (query, doc), quantization to ``score_decimals``, and
the K2 tie-break (score DESC, doc_id ASC). The formulas are
deterministic functions of (qtf, tf, df, cf, dl, N, avgdl, total_dl),
so the DuckDB oracle twins (``oracle.sqlgen.similarity_topk_sql``)
recompute them exactly.

Formula provenance (public Lucene semantics, restated as our law):

- ``bm25``     — Okapi BM25, k1=1.2 b=0.75 (BM25Similarity): the
  engine default; the object form must stay score-identical to the
  inlined default expression in ``_bm25_scored`` (identity-tested).
- ``classic``  — TF-IDF (ClassicSimilarity): contribution
  ``qtf · idf_c² · sqrt(tf) / sqrt(dl)`` with
  ``idf_c = 1 + ln((N+1)/(df+1))``. The idf appears squared because
  classic TF-IDF weights both the query and the document vector;
  queryNorm and coord are dropped (Lucene itself removed both).
- ``lmdirichlet`` — LM with Dirichlet smoothing (LMDirichletSimilarity,
  µ=2000): contribution
  ``qtf · max(0, ln(1 + tf/(µ·p)) + ln(µ/(dl+µ)))`` with the
  collection model ``p = cf / total_dl``. The per-term clamp at 0 is
  Lucene's (a term more common in the doc than the collection predicts
  scores positive; one at the collection rate scores zero, never
  negative).
- ``boolean``  — BooleanSimilarity: contribution ``qtf`` (the boost);
  the score is the number of matching query-term occurrences, ranking
  by coverage only.

Scale shape: identical to BM25's — similarities only change the
broadcast payload (≤2 extra float64 per query term) and the codegen'd
arithmetic; the postings scan, the (query, doc) shuffle, and the
adaptive two-stage rank are untouched.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Similarity:
    """Base: subclasses override the driver and executor laws."""

    name: str = "base"
    #: extra per-(query, term) float64 columns this similarity ships on
    #: the scoring broadcast besides ``w`` (see ``driver_cols``).
    extra_cols: tuple[str, ...] = ()

    def driver_cols(self, qw: pd.DataFrame, index) -> pd.DataFrame:
        """Per-(query, term) constants from the lexicon slice.

        ``qw`` carries query_id, term, qtf, n_terms, k, idf, df, cf.
        Must return ``qw`` with a float64 ``w`` column added (plus any
        ``extra_cols``)."""
        raise NotImplementedError

    def contrib_expr(self, index):
        """Catalyst column over (w[, extra...], tf, dl) — the per-
        (query, term, doc) score contribution."""
        raise NotImplementedError


@dataclass(frozen=True)
class BM25Similarity(Similarity):
    """Okapi BM25 — the engine default, parameterized by cfg.bm25."""

    name: str = "bm25"

    def driver_cols(self, qw: pd.DataFrame, index) -> pd.DataFrame:
        return qw.assign(w=qw["qtf"] * qw["idf"])

    def contrib_expr(self, index):
        p = index.cfg.bm25
        return (
            F.col("w")
            * (F.col("tf") * F.lit(p.k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(p.k1)
                * (F.lit(1.0 - p.b) + F.lit(p.b) * F.col("dl") / F.lit(index.avgdl))
            )
        )


@dataclass(frozen=True)
class ClassicSimilarity(Similarity):
    """TF-IDF (Lucene ClassicSimilarity, queryNorm/coord dropped)."""

    name: str = "classic"

    def driver_cols(self, qw: pd.DataFrame, index) -> pd.DataFrame:
        idf_c = 1.0 + np.log((float(index.n_docs) + 1.0) / (qw["df"].astype("float64") + 1.0))
        return qw.assign(w=qw["qtf"].astype("float64") * idf_c * idf_c)

    def contrib_expr(self, index):
        # postings rows exist only for docs containing the term, so
        # tf >= 1 and dl >= 1 — no zero-division guard needed
        return F.col("w") * F.sqrt(F.col("tf")) / F.sqrt(F.col("dl"))


@dataclass(frozen=True)
class LMDirichletSimilarity(Similarity):
    """Language model with Dirichlet smoothing (µ=2000 default)."""

    name: str = "lmdirichlet"
    mu: float = 2000.0
    # mp = µ · p(t|C) = µ · cf / total_dl, a per-term broadcast constant
    extra_cols: tuple[str, ...] = ("mp",)

    def __post_init__(self):
        if self.mu <= 0:
            raise ValueError(f"mu must be > 0, got {self.mu}")

    def driver_cols(self, qw: pd.DataFrame, index) -> pd.DataFrame:
        total = float(index.total_dl)
        if total <= 0:
            raise ValueError("LMDirichlet needs total_dl > 0 (empty index?)")
        return qw.assign(
            w=qw["qtf"].astype("float64"),
            mp=self.mu * qw["cf"].astype("float64") / total,
        )

    def contrib_expr(self, index):
        mu = float(self.mu)
        raw = (
            F.log(F.lit(1.0) + F.col("tf") / F.col("mp"))
            + F.log(F.lit(mu) / (F.col("dl") + F.lit(mu)))
        )
        return F.col("w") * F.greatest(raw, F.lit(0.0))


@dataclass(frozen=True)
class BooleanSimilarity(Similarity):
    """Coverage-only scoring (Lucene BooleanSimilarity)."""

    name: str = "boolean"

    def driver_cols(self, qw: pd.DataFrame, index) -> pd.DataFrame:
        return qw.assign(w=qw["qtf"].astype("float64"))

    def contrib_expr(self, index):
        return F.col("w")


_REGISTRY = {
    "bm25": BM25Similarity,
    "classic": ClassicSimilarity,
    "lmdirichlet": LMDirichletSimilarity,
    "boolean": BooleanSimilarity,
}


def resolve_similarity(sim) -> Similarity | None:
    """None (engine-default BM25) | name | Similarity instance."""
    if sim is None or isinstance(sim, Similarity):
        return sim
    try:
        return _REGISTRY[sim]()
    except KeyError:
        raise ValueError(
            f"unknown similarity {sim!r}; one of {sorted(_REGISTRY)}"
        ) from None
