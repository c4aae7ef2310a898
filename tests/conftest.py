import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from org_rdkit_lucene_spark.config import IndexConfig
from org_rdkit_lucene_spark.operators.build import build_index
from org_rdkit_lucene_spark.session import get_spark
from org_rdkit_lucene_spark.sources.fixtures import make_corpus_pdf, make_query_set


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_pdf():
    return make_corpus_pdf(n_docs=200, seed=42)


@pytest.fixture(scope="session")
def small_pdf():
    return make_corpus_pdf(n_docs=400, seed=42)


@pytest.fixture(scope="session")
def queries_pdf():
    return make_query_set(seed=42)


@pytest.fixture(scope="session")
def tiny_corpus(spark, tiny_pdf):
    return spark.createDataFrame(tiny_pdf)


@pytest.fixture(scope="session")
def small_corpus(spark, small_pdf):
    return spark.createDataFrame(small_pdf)


@pytest.fixture(scope="session")
def small_index(spark, small_corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_small"))
    cfg = IndexConfig(build_partitions=8, hot_term_df=50, n_salts=4)
    idx = build_index(spark, small_corpus, cfg, d)
    assert idx is not None
    return idx
