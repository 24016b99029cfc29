"""Shared fixtures: one local SparkSession per test run + seeded synth data."""

from __future__ import annotations

import pandas as pd
import pytest

from kg import synth
from kg.schema import ALIAS_PAIRS_SCHEMA, CATALOG_SCHEMA, TRANSCRIPTS_SCHEMA
from kg.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("kg-tests", parallelism=4, shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def catalog_pdf() -> pd.DataFrame:
    return synth.synth_catalog(200)


@pytest.fixture(scope="session")
def alias_pairs_pdf() -> pd.DataFrame:
    return synth.synth_alias_pairs(200)


@pytest.fixture(scope="session")
def transcripts_pdf(catalog_pdf) -> pd.DataFrame:
    return synth.synth_transcripts(catalog_pdf, n_convs=60)


@pytest.fixture(scope="session")
def catalog_df(spark, catalog_pdf):
    return spark.createDataFrame(catalog_pdf, schema=CATALOG_SCHEMA)


@pytest.fixture(scope="session")
def alias_pairs_df(spark, alias_pairs_pdf):
    return spark.createDataFrame(alias_pairs_pdf, schema=ALIAS_PAIRS_SCHEMA)


@pytest.fixture(scope="session")
def transcripts_df(spark, transcripts_pdf):
    return spark.createDataFrame(transcripts_pdf, schema=TRANSCRIPTS_SCHEMA)
