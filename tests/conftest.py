"""Shared pytest fixtures: one local SparkSession + the fixture corpus."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from modernsearchengines_spark.session import get_spark  # noqa: E402
from modernsearchengines_spark.sources.docs import (  # noqa: E402
    generate_docs,
    write_docs_parquet,
)


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        "msengines-tests",
        cores=int(os.environ.get("SPARK_GRAFT_CPUS", "8")),
        extra_conf={"spark.sql.shuffle.partitions": "8"},
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def corpus_rows():
    return generate_docs(n_docs=300, seed=42)


@pytest.fixture(scope="session")
def docs_parquet(corpus_rows, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("fixture") / "docs.parquet")
    write_docs_parquet(corpus_rows, path)
    return path


@pytest.fixture(scope="session")
def docs_df(spark, docs_parquet):
    return spark.read.parquet(docs_parquet)
