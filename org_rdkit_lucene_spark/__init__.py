"""org_rdkit_lucene_spark — a from-scratch PySpark-native full-text
inverted-index build + BM25 top-k query engine.

Re-expresses the query/data-processing capabilities of the reference
``rdkit/org.rdkit.lucene`` (a Lucene-3.6.1-based chemical search index,
see ``/root/reference``) as an idiomatic Spark engine over a source-code
corpus ``(repo, path, commit, lang, content)``:

- tokenization (reference: fingerprint bit emission,
  ``ChemicalIndex.java:822-825``) → code-aware tokenizer
  (camelCase/snake_case splitting) in vectorized pandas UDFs / built-in
  Catalyst expressions;
- inverted index (reference: Lucene segments, ``ChemicalIndex.java:864-876``)
  → ``postings`` / ``lexicon`` / ``docmeta`` Parquet tables built SPIMI-style
  with a salted term merge and delta+varbyte block compression;
- top-k search (reference: ``TopScoreDocCollector`` /
  ``SubstructureHitQueue.java:113-118`` tie-break) → Okapi BM25
  (k1=1.2, b=0.75) block-max-WAND kernel plus a pure-DataFrame path,
  both ranked ``score DESC, doc_id ASC``.
"""

from org_rdkit_lucene_spark.config import BM25Params, IndexConfig, TokenizerProfile


def __getattr__(name):  # lazy: importing the package must not require a JVM
    _API = {
        "build_index": ("org_rdkit_lucene_spark.operators.build", "build_index"),
        "InvertedIndex": ("org_rdkit_lucene_spark.operators.build", "InvertedIndex"),
        "search": ("org_rdkit_lucene_spark.operators.query", "search"),
        "search_wand": ("org_rdkit_lucene_spark.operators.wand", "search_wand"),
        "search_two_phase": ("org_rdkit_lucene_spark.operators.query", "search_two_phase"),
        "search_syntax": ("org_rdkit_lucene_spark.operators.query", "search_syntax"),
        "search_after": ("org_rdkit_lucene_spark.operators.query", "search_after"),
        "hit_counts": ("org_rdkit_lucene_spark.operators.query", "hit_counts"),
        "SegmentedIndex": ("org_rdkit_lucene_spark.streaming.incremental", "SegmentedIndex"),
        "index_stream": ("org_rdkit_lucene_spark.streaming.incremental", "index_stream"),
        "get_spark": ("org_rdkit_lucene_spark.session", "get_spark"),
    }
    if name in _API:
        import importlib

        mod, attr = _API[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)


__all__ = [
    "BM25Params", "IndexConfig", "TokenizerProfile",
    "build_index", "InvertedIndex", "search", "search_wand",
    "search_two_phase", "search_syntax", "search_after", "hit_counts",
    "SegmentedIndex", "index_stream", "get_spark",
]
__version__ = "0.1.0"
