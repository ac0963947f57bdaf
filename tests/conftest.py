from __future__ import annotations

import pytest

from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.session import (
    get_spark,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=4)
    yield s
