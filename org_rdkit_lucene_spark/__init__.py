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

__all__ = ["BM25Params", "IndexConfig", "TokenizerProfile"]
__version__ = "0.1.0"
