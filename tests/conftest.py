from __future__ import annotations

import pytest

from sparkgrep.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("sparkgrep-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus(spark):
    from sparkgrep.sources.corpus import load_corpus

    return load_corpus(spark, SF_DIR).cache()


@pytest.fixture(scope="session")
def code_corpus(spark):
    from sparkgrep.sources.corpus import synth_corpus

    return synth_corpus(spark, 300, seed=7).cache()
