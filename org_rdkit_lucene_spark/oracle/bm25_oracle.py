"""Single-node brute-force BM25 oracle.

The golden rank-identical target for the Spark engine (SURVEY §5):
deliberately simple pandas/numpy, same canonical tokenizer, Okapi BM25
k1=1.2 b=0.75, quantized scores, tie-break score DESC then doc_id ASC
(``SubstructureHitQueue.java:113-118``). Mirrors the reference's
contract that phase-A scores order final results
(``ChemicalIndex.java:697``).
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import numpy as np
import pandas as pd

from org_rdkit_lucene_spark.config import BM25Params, TokenizerProfile, candidate_cap
from org_rdkit_lucene_spark.functions.tokenizer import tokenize_text, tokenize_texts


class BM25Oracle:
    def __init__(
        self,
        corpus: pd.DataFrame,  # columns: doc_id, content
        params: BM25Params | None = None,
        profile: TokenizerProfile | None = None,
    ):
        self.p = params or BM25Params()
        self.profile = profile or TokenizerProfile()
        self.doc_ids = corpus["doc_id"].to_numpy(np.int64)
        self.contents = corpus["content"].tolist()
        toks = tokenize_texts(corpus["content"], self.profile)
        self.doc_terms: list[Counter] = [Counter(t) for t in toks]
        self.doc_len = np.array([sum(c.values()) for c in self.doc_terms], dtype=np.float64)
        self.n = len(self.doc_ids)
        self.avgdl = float(self.doc_len.mean()) if self.n else 0.0
        self.df: Counter = Counter()
        for c in self.doc_terms:
            self.df.update(c.keys())

    def idf(self, term: str) -> float:
        df = self.df.get(term, 0)
        return math.log(1.0 + (self.n - df + 0.5) / (df + 0.5))

    def _scores(self, text: str, conjunctive: bool) -> np.ndarray:
        qcounts = Counter(tokenize_text(text, self.profile))
        scores = np.zeros(self.n, dtype=np.float64)
        matched = np.zeros(self.n, dtype=np.int64)
        k1, b = self.p.k1, self.p.b
        for term, qtf in qcounts.items():
            w = self.idf(term)
            for i, c in enumerate(self.doc_terms):
                tf = c.get(term, 0)
                if tf:
                    matched[i] += 1
                    scores[i] += qtf * w * tf * (k1 + 1.0) / (
                        tf + k1 * (1.0 - b + b * self.doc_len[i] / self.avgdl)
                    )
        if conjunctive:
            scores[matched < len(qcounts)] = np.nan
        else:
            scores[matched == 0] = np.nan
        return scores

    def _rank(self, scores: np.ndarray, k: int) -> pd.DataFrame:
        q = np.floor(scores * 10**self.p.score_decimals + 0.5)
        ok = ~np.isnan(q)
        idx = np.flatnonzero(ok)
        order = np.lexsort((self.doc_ids[idx], -q[idx]))
        top = idx[order[:k]]
        return pd.DataFrame(
            {
                "rank": np.arange(1, len(top) + 1, dtype=np.int32),
                "doc_id": self.doc_ids[top],
                "score_q": q[top].astype(np.int64),
            }
        )

    def search(self, text: str, k: int, mode: str = "disjunctive") -> pd.DataFrame:
        return self._rank(self._scores(text, mode == "conjunctive"), k)

    def search_two_phase(self, text: str, k: int) -> pd.DataFrame:
        """Q6 oracle: conjunctive candidates capped at min(10k, 1e5),
        substring verify on raw text, phase-A score kept."""
        cand = self.search(text, candidate_cap(k), mode="conjunctive")
        pos = {int(d): i for i, d in enumerate(self.doc_ids)}
        keep = [text in self.contents[pos[int(d)]] for d in cand["doc_id"]]
        out = cand[np.array(keep, dtype=bool)].head(k).copy()
        out["rank"] = np.arange(1, len(out) + 1, dtype=np.int32)
        return out.reset_index(drop=True)

    def total_hits(self, text: str, mode: str = "disjunctive") -> int:
        return int((~np.isnan(self._scores(text, mode == "conjunctive"))).sum())

    def sha256(self) -> pd.Series:
        return pd.Series(
            [hashlib.sha256(c.encode("utf-8")).hexdigest() for c in self.contents]
        )
