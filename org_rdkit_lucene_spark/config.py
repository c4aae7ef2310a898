"""Typed configuration with validation.

Analog of the reference's pluggable settings objects
(``fingerprint/FingerprintSettings.java``,
``fingerprint/FingerprintType.java:64-73`` per-type invariant checks,
``InvalidFingerprintSettingsException``): every profile validates its
invariants eagerly and raises ``ValueError`` on violation.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class BM25Params:
    """Okapi BM25 parameters (north_star: k1=1.2, b=0.75).

    Replaces the reference's delegated Lucene TF-IDF scoring
    (invoked at ``ChemicalIndex.java:487,550,585,632``).
    """

    k1: float = 1.2
    b: float = 0.75
    # Scores are computed in float64 and rounded to `score_decimals`
    # for cross-engine rank stability; the reference compares float32
    # scores exactly (SubstructureHitQueue.java:113-118).
    score_decimals: int = 4

    def __post_init__(self) -> None:
        if self.k1 < 0:
            raise ValueError(f"k1 must be >= 0, got {self.k1}")
        if not (0.0 <= self.b <= 1.0):
            raise ValueError(f"b must be in [0,1], got {self.b}")
        if not (0 <= self.score_decimals <= 12):
            raise ValueError(f"score_decimals must be in [0,12], got {self.score_decimals}")


@dataclass(frozen=True)
class TokenizerProfile:
    """Tokenizer settings.

    Analog of the reference's doc/query fingerprint settings asymmetry
    (``LuceneBenchmark.java:589-599``: same algorithm, different flags):
    one shared pipeline, optional n-gram augmentation per profile.
    """

    name: str = "code_default"
    split_camel_case: bool = True
    lowercase: bool = True
    min_token_len: int = 1
    max_token_len: int = 64
    # token n-grams appended to the base tokens (0 = off) — supported
    # on all three parity paths; only the Arrow build fast path is
    # gated to the default profile
    ngram: int = 0
    # drop pure-numeric tokens (identifiers_only profile) — supported
    # on all three parity paths (pandas / Catalyst / DuckDB SQL)
    drop_numeric: bool = False
    # replace each token with its character n-grams (0 = off; tokens
    # shorter than n pass through whole) — the trigram profile;
    # supported on all three parity paths
    char_ngram: int = 0
    # Lucene StopFilter analog: tokens in this set are dropped AFTER
    # the length/numeric filters and BEFORE any n-gram stage (the
    # token-chain position of StandardAnalyzer + StopFilter).
    # Supported on all three parity paths; the Arrow build fast path
    # is gated off for stopword profiles.
    stopwords: tuple[str, ...] = ()

    def __post_init__(self) -> None:
        if self.min_token_len < 1:
            raise ValueError(f"min_token_len must be >= 1, got {self.min_token_len}")
        if self.max_token_len < self.min_token_len:
            raise ValueError(
                f"max_token_len ({self.max_token_len}) < min_token_len ({self.min_token_len})"
            )
        if self.ngram < 0:
            raise ValueError(f"ngram must be >= 0, got {self.ngram}")
        if self.char_ngram < 0:
            raise ValueError(f"char_ngram must be >= 0, got {self.char_ngram}")
        if self.char_ngram > 0 and self.ngram > 0:
            raise ValueError("char_ngram and ngram are mutually exclusive")
        for w in self.stopwords:
            if not w or (self.lowercase and w != w.lower()):
                raise ValueError(
                    f"stopword {w!r} must be non-empty and lowercase when "
                    "the profile lowercases (it could never match a token)"
                )

    @property
    def arrow_fast_path_ok(self) -> bool:
        """Whether the ASCII Arrow-native build fast path implements
        this profile (it covers only the default token pipeline; other
        profiles take the canonical pandas path)."""
        return (
            self.ngram == 0
            and self.char_ngram == 0
            and not self.drop_numeric
            and not self.stopwords
        )


@dataclass(frozen=True)
class IndexConfig:
    """Index build/layout configuration.

    Block layout replaces Lucene's freq/prox + skip-list files (delegated by
    the reference at ``ChemicalIndex.java:847,864-876``): fixed-size blocks of
    ``block_size`` postings, each independently decodable (absolute first
    doc_id + varbyte'd deltas) and carrying block-max metadata for WAND.
    """

    block_size: int = 128
    # Posting-bytes codec: "varbyte" (variable width, skewed gaps) or
    # "for" (Frame-of-Reference fixed bit-width, dense blocks). Recorded
    # in stats.json so queries decode with the build-time codec.
    codec: str = "varbyte"
    # Salted term-merge: hot terms (df >= hot_term_df) are built in
    # `n_salts` doc_id-range buckets, then concatenated (SURVEY §7.3).
    # The threshold is a MEMORY bound, not a frequency taste: a term's
    # postings are materialized per-task at ~14 B/row, so 65536 rows is
    # ~1 MB — far under any executor budget — while routing medium
    # terms through the two-pass salted merge costs two extra shuffle
    # stages for nothing (measured: df>=4096 salted 698 terms and was
    # ~16% slower in stage 4 than df>=65536's 114; salting fully OFF is
    # slower still because giant terms skew the cold sort).
    hot_term_df: int = 65536
    n_salts: int = 8
    # Above this many hot terms, the hot/cold split uses a broadcast
    # join instead of inlining an `isin` literal list into the plan
    # (a multi-thousand-literal In bloats analysis/codegen at 100x
    # corpus scale; the broadcast join is plan-size O(1)).
    hot_broadcast_threshold: int = 10_000
    build_partitions: int = 32
    # Error budget: abort ingest if this many consecutive rows fail to
    # tokenize (analog of ChemicalIndex.java:285-287's 100-failure abort).
    max_consecutive_errors: int = 100
    bm25: BM25Params = field(default_factory=BM25Params)
    tokenizer: TokenizerProfile = field(default_factory=TokenizerProfile)

    def __post_init__(self) -> None:
        if self.block_size < 1:
            raise ValueError(f"block_size must be >= 1, got {self.block_size}")
        if self.codec not in ("varbyte", "for"):
            raise ValueError(f"codec must be 'varbyte' or 'for', got {self.codec!r}")
        if self.n_salts < 1:
            raise ValueError(f"n_salts must be >= 1, got {self.n_salts}")
        if self.hot_term_df < 1:
            raise ValueError(f"hot_term_df must be >= 1, got {self.hot_term_df}")
        if self.hot_broadcast_threshold < 0:
            raise ValueError(
                f"hot_broadcast_threshold must be >= 0, got {self.hot_broadcast_threshold}"
            )
        if self.build_partitions < 1:
            raise ValueError(f"build_partitions must be >= 1, got {self.build_partitions}")
        if self.max_consecutive_errors < 1:
            raise ValueError(
                f"max_consecutive_errors must be >= 1, got {self.max_consecutive_errors}"
            )


# ---------------------------------------------------------------------------
# Analyzer registry (T3) — named, pluggable term-extractor profiles,
# the analog of the reference's FingerprintType registry
# (fingerprint/FingerprintType.java:44-434: one enum constant per
# fingerprint algorithm, each with validated settings). Every profile
# here is implemented on all three parity paths (pandas canonical /
# Catalyst / DuckDB SQL — tests/test_tokenizer.py).

ANALYZERS: dict[str, TokenizerProfile] = {
    "code_default": TokenizerProfile(),
    # identifiers only: pure-numeric tokens dropped, single chars too
    "identifiers_only": TokenizerProfile(
        name="identifiers_only", min_token_len=2, drop_numeric=True
    ),
    # character trigrams of each identifier sub-word — the substring-
    # search-friendly profile (short tokens pass through whole)
    "trigram": TokenizerProfile(name="trigram", char_ngram=3),
    # Lucene's classic English stop set (EnglishAnalyzer
    # ENGLISH_STOP_WORDS_SET, 33 words) through the StopFilter stage —
    # for prose-heavy fields (docstrings, comments, READMEs)
    "english_stop": TokenizerProfile(
        name="english_stop",
        stopwords=(
            "a", "an", "and", "are", "as", "at", "be", "but", "by",
            "for", "if", "in", "into", "is", "it", "no", "not", "of",
            "on", "or", "such", "that", "the", "their", "then",
            "there", "these", "they", "this", "to", "was", "will",
            "with",
        ),
    ),
}


def get_analyzer(name: str) -> TokenizerProfile:
    """Look up a named analyzer profile; unknown names fail eagerly
    (InvalidFingerprintSettingsException analog)."""
    try:
        return ANALYZERS[name]
    except KeyError:
        raise ValueError(
            f"unknown analyzer {name!r}; available: {sorted(ANALYZERS)}"
        ) from None


# Candidate-cap policy for two-phase search: min(k*10, 100000)
# (reference constant at ChemicalIndex.java:660-661).
def candidate_cap(k: int) -> int:
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    return min(k * 10, 100_000)
