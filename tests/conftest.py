from __future__ import annotations

import pytest

from ncbi_analysis_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="ncbi-analysis-tests", cpus="4", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
