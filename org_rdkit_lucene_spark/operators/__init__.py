from org_rdkit_lucene_spark.operators.build import InvertedIndex, assign_doc_ids, build_index

__all__ = ["InvertedIndex", "assign_doc_ids", "build_index"]
