from __future__ import annotations

import pytest

from hdtspark import oracle, pipeline, synth
from hdtspark.session import get_spark

GOLDEN_SEED = 42
GOLDEN_N_CONV = 60


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="hdtspark-tests", master="local[8]",
                  shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def golden_rows():
    return synth.generate_rows(GOLDEN_SEED, GOLDEN_N_CONV)


@pytest.fixture(scope="session")
def golden_oracle(golden_rows):
    return oracle.build(golden_rows)


@pytest.fixture(scope="session")
def transcripts(spark, golden_rows):
    return spark.createDataFrame(golden_rows, synth.TRANSCRIPTS_SCHEMA).cache()


@pytest.fixture(scope="session")
def kg(spark, transcripts):
    return pipeline.build_kg(transcripts)
