from __future__ import annotations

import pytest

from simages_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF01_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("simages_spark_tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def docs_sf0001(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="session")
def docs_sf001(spark):
    return spark.read.parquet(f"{SF01_DIR}/documents.parquet").cache()


@pytest.fixture(scope="session")
def dedup_sf001(spark, docs_sf001):
    """find_duplicates at sf0.01, computed once: (edges rows, clusters rows)."""
    from simages_spark.config import DedupConfig
    from simages_spark.pipeline import find_duplicates

    result = find_duplicates(docs_sf001, DedupConfig())
    return result.edges.collect(), result.clusters.collect()


@pytest.fixture(scope="session")
def oracle_edges_sf001(spark, docs_sf001):
    """Exact brute-force Jaccard edges at sf0.01, computed once."""
    from simages_spark.config import DedupConfig
    from simages_spark.operators.bruteforce import bruteforce_jaccard_pairs

    return bruteforce_jaccard_pairs(docs_sf001, DedupConfig()).collect()
