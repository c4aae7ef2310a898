from org_rdkit_lucene_spark.oracle.bm25_oracle import BM25Oracle

__all__ = ["BM25Oracle"]
