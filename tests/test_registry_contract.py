"""Driver-contract invariants over the query registry — the failure
modes that would silently break CORRECTNESS_r{N} hashing in a later
round (column-name mismatch, duplicate output columns, unregistered
oracle keys)."""

from __future__ import annotations

import duckdb
import pytest

from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark import registry

_QUERIES = registry.queries()
_ORACLE = registry.oracle_sql()
SF_DIR = "/root/testdata/sf0.001"


def test_every_oracle_key_is_registered():
    assert set(_ORACLE) <= set(_QUERIES)


def test_query_names_are_well_formed():
    for name in _QUERIES:
        assert name.startswith("q_") and name.replace("_", "").isalnum()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_output_columns_unique_and_oracle_aligned(spark, name):
    """The driver sorts columns by name before hashing: duplicate names
    or a Spark/oracle column-set mismatch breaks the compare even with
    identical values. Checked structurally at the smoke tier (DuckDB
    LIMIT 0 — no data read)."""
    df = _QUERIES[name](spark, SF_DIR)
    assert len(df.columns) == len(set(df.columns)), f"{name}: duplicate columns"
    if name in _ORACLE:
        con = duckdb.connect()
        for t in (
            "region nation customer supplier part orders lineitem events "
            "documents embeddings".split()
        ):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
            )
        res = con.execute(f"SELECT * FROM ({_ORACLE[name]}) LIMIT 0")
        duck_cols = [d[0] for d in res.description]
        con.close()
        assert sorted(df.columns) == sorted(duck_cols), (
            f"{name}: spark={sorted(df.columns)} oracle={sorted(duck_cols)}"
        )


def test_oracle_edit_requeues_verified_query(tmp_path, monkeypatch):
    """The round-2 regression class: a query hash-passes in round N, its
    oracle is edited in round N+1, and the registry must STOP treating
    it as verified (so the driver re-checks it). Simulated with a fake
    repo root holding a CORRECTNESS pass and a blessed fingerprint."""
    import json

    name = "q_agg_basic"
    monkeypatch.setattr(registry, "_repo_root", lambda: str(tmp_path))
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({name: {"rows_match": True, "schema_match": True,
                           "hash_match": True, "spark_rows": 1, "err": None}})
    )
    registry._load()
    current = registry._ORACLE[name]
    # blessed at the text the driver ran -> verified
    (tmp_path / "ORACLE_VERIFIED.json").write_text(
        json.dumps({name: registry.oracle_fingerprint(current)})
    )
    assert name in registry._verified_names()
    # whitespace-only reformat does NOT re-queue
    (tmp_path / "ORACLE_VERIFIED.json").write_text(
        json.dumps({name: registry.oracle_fingerprint("  " + current.replace("\n", "  \n"))})
    )
    assert name in registry._verified_names()
    # semantic edit DOES re-queue
    (tmp_path / "ORACLE_VERIFIED.json").write_text(
        json.dumps({name: registry.oracle_fingerprint(current + " LIMIT 999")})
    )
    assert name not in registry._verified_names()
