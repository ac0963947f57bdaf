"""Arrow-level type discipline for the oracle harness (round-2 fix).

Two guarantees:
1. The local comparator FAILS on a decimal128-vs-int64 column — the
   exact drift (DuckDB ``sum(INTEGER)`` -> HUGEINT -> decimal128) that
   the old ``fetchall()``-based comparison could not see and that cost
   three driver hash checks in round 2.
2. No registered oracle emits a decimal128/hugeint column at all, so
   the driver-side hash (type-sensitive) can never diverge from the
   Spark bigint output for type reasons again. The sweep runs DuckDB
   only (cheap at sf0.001) — Spark always emits int64 for sums.
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark import registry

from oracle_utils import arrow_family, assert_arrow_families_match, duck_connection

SF_DIR = "/root/testdata/sf0.001"

_ORACLE = registry.oracle_sql()


def test_family_check_catches_hugeint_drift():
    """decimal128(38,0) (DuckDB HUGEINT via Arrow) vs int64 must fail."""
    spark_side = pa.table({"n": pa.array([1, 2], type=pa.int64())})
    duck_side = pa.table({"n": pa.array([1, 2]).cast(pa.decimal128(38, 0))})
    with pytest.raises(AssertionError, match="type-family mismatch"):
        assert_arrow_families_match(spark_side, duck_side)


def test_family_check_tolerates_width_and_tz():
    """int32 vs int64 and tz-aware vs naive timestamps are one family."""
    a = pa.table(
        {
            "n": pa.array([1], type=pa.int32()),
            "t": pa.array([0], type=pa.timestamp("us", tz="UTC")),
        }
    )
    b = pa.table(
        {
            "n": pa.array([1], type=pa.int64()),
            "t": pa.array([0], type=pa.timestamp("us")),
        }
    )
    assert_arrow_families_match(a, b)


def test_arrow_family_nested():
    assert arrow_family(pa.list_(pa.float32())) == "list<float>"
    assert arrow_family(pa.decimal128(38, 0)) == "decimal"


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(_ORACLE))
def test_no_oracle_emits_decimal(duck, name):
    tbl = duck.execute(_ORACLE[name]).fetch_arrow_table()
    offenders = {
        f.name: str(f.type)
        for f in tbl.schema
        if "decimal" in arrow_family(f.type)
    }
    assert not offenders, (
        f"{name}: oracle emits decimal128/hugeint columns {offenders}; "
        "wrap the integer sum in CAST(... AS BIGINT)"
    )
