from org_rdkit_lucene_spark.sources.fixtures import make_corpus_pdf, make_query_set
from org_rdkit_lucene_spark.sources.tables import load_corpus, load_tables

__all__ = ["make_corpus_pdf", "make_query_set", "load_corpus", "load_tables"]
