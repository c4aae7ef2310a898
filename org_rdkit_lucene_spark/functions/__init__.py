from org_rdkit_lucene_spark.functions.tokenizer import (
    duckdb_tokens_sql,
    tokenize_texts,
    tokens_column,
)

__all__ = ["tokenize_texts", "tokens_column", "duckdb_tokens_sql"]
