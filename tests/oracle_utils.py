"""Local stand-in for the driver's DuckDB oracle comparison: run a
registered Spark query and its oracle SQL on the same parquet, compare
row count, column names, order-insensitive values (float-tolerant),
AND Arrow-level type families.

The Arrow check exists because of the round-2 driver failures: DuckDB
``sum(INTEGER)`` returns HUGEINT, which surfaces through Arrow as
``decimal128(38,0)`` while Spark emits ``int64`` — values identical,
hashes different. ``fetchall()`` hides that (both sides become Python
int), so the value comparison alone shipped the bug twice. ``compare``
now also fetches both sides as Arrow tables and requires each column's
type FAMILY to match (all int widths are one family; decimal is NOT in
it)."""

from __future__ import annotations

import datetime
import math

import duckdb
import pyarrow as pa


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def arrow_family(t: pa.DataType) -> str:
    """Collapse an Arrow type to the family the driver's value hash is
    sensitive to. Int widths and signedness are one family; float32/64
    one; decimal128/256 are their OWN family (the HUGEINT trap);
    timestamp tz/unit variants are one; nested types recurse."""
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return f"list<{arrow_family(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(
            f"{t.field(i).name}:{arrow_family(t.field(i).type)}"
            for i in range(t.num_fields)
        )
        return f"struct<{inner}>"
    if pa.types.is_map(t):
        return f"map<{arrow_family(t.key_type)},{arrow_family(t.item_type)}>"
    if pa.types.is_null(t):
        return "null"
    return str(t)


def assert_arrow_families_match(spark_tbl: pa.Table, duck_tbl: pa.Table) -> None:
    """Column-name-aligned Arrow type-family equality. A ``null``-typed
    column (all-NULL literal in one engine) is allowed to match any
    family, since it carries no representational information."""
    s = {f.name: arrow_family(f.type) for f in spark_tbl.schema}
    d = {f.name: arrow_family(f.type) for f in duck_tbl.schema}
    assert set(s) == set(d), f"arrow column mismatch: {sorted(s)} vs {sorted(d)}"
    bad = {
        k: (s[k], d[k])
        for k in s
        if s[k] != d[k] and "null" not in (s[k], d[k])
    }
    assert not bad, f"arrow type-family mismatch (spark, duck): {bad}"


def _canon(v):
    if v is None:
        return ("N",)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", round(v, 6))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, datetime.datetime):
        # Arrow surfaces Spark timestamps tz-aware (session tz) and
        # DuckDB's naive; normalize both to naive UTC wall time.
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return ("t", str(v))
    if isinstance(v, datetime.date):
        return ("t", str(v))
    if isinstance(v, (list, tuple)):
        return ("l", tuple(_canon(x) for x in v))
    if isinstance(v, dict):
        return ("d", tuple(sorted((k, _canon(x)) for k, x in v.items())))
    return ("s", str(v))


def _rows_canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def compare(spark_df, con, sql: str) -> None:
    spark_cols = spark_df.columns
    spark_tbl = spark_df.toArrow()
    spark_rows = [tuple(d.values()) for d in spark_tbl.to_pylist()]
    duck_tbl = con.execute(sql).fetch_arrow_table()
    duck_cols = duck_tbl.column_names
    duck_rows = [tuple(d.values()) for d in duck_tbl.to_pylist()]

    assert_arrow_families_match(spark_tbl, duck_tbl)

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    a = _rows_canon(spark_cols, spark_rows)
    b = _rows_canon(duck_cols, duck_rows)
    for i, (x, y) in enumerate(zip(a, b)):
        assert x == y, f"first differing row #{i}:\n  spark={x}\n  duck ={y}"
