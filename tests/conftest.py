from __future__ import annotations

import pytest

from igd_spark.corpus import synth_transcripts_pdf
from igd_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(cores=8, app="igd_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tiny_pdf():
    # FIXTURES.md §1 "tiny": ~50 convs × ~8 turns
    return synth_transcripts_pdf(n_convs=50, seed=42)


@pytest.fixture(scope="session")
def tiny_docs(spark, tiny_pdf):
    from igd_spark.corpus import TRANSCRIPT_SCHEMA

    df = spark.createDataFrame(tiny_pdf, schema=TRANSCRIPT_SCHEMA)
    return df.cache()
