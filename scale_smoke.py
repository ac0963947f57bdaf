"""Data-bound tier smoke: replicate the corpus tables N× and measure
per-query Spark vs DuckDB wall time, so BASELINE.md's scale tables come
from a committed, reproducible tool instead of ad-hoc shell history.

Builds an N× tier in /tmp from a base sf dir: ``documents`` and
``embeddings`` are replicated with ids shifted by a multiple of 1200
per copy (1200 is divisible by every modulus the registered queries
decimate on — 5, 8, 16, 20, 25, 50 — so probe/test-split rates are
preserved exactly); every other table hardlinks to the base. Then each
named query runs on Spark at 1× and N× (best of ``--reps``) and its
registered DuckDB oracle runs at N× (single run), printing one JSON
object with the timings.

Usage:
  python scale_smoke.py --mult 10 \
      --queries q_prf_expand,q_late_interaction,q_weighted_sample
"""

from __future__ import annotations

import argparse
import json
import math
import os
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

#: table -> id columns shifted per copy (events shifts BOTH ids so each
#: copy is new users emitting at the SAME timestamps — windowed state
#: grows with keys, event-time geometry stays fixed, which is how a
#: stream actually scales)
REPLICATED = {
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
    "events": ("event_id", "user_id"),
    "orders": ("o_orderkey",),
    "lineitem": ("l_orderkey",),
}
#: columns that must shift by the SAME amount across tables so foreign
#: keys stay consistent (orders↔lineitem share the order-key space;
#: o_custkey / l_partkey / l_suppkey stay unshifted, so each copy is
#: new orders over the SAME customer/part/supplier dimensions — the
#: fact-grows-dims-don't shape of a real warehouse scale-up)
SHARED_SHIFT_GROUPS = ({"o_orderkey", "l_orderkey"},)
SHIFT_QUANTUM = 1200  # lcm-safe over the query-decimation moduli


def build_tier(
    base: str,
    mult: int,
    out_root: str = "/tmp/spark_graft_tier",
    only: tuple[str, ...] = (),
) -> str:
    """Build (or reuse) the N× tier. The tier directory name embeds a
    fingerprint (mtime+size of every base table file), so regenerating
    the base fixture at the same path changes the fingerprint and the
    stale tier is simply never addressed again — same staleness guard
    as q_partition_prune's layout cache. The build stages into a unique
    temp dir and atomically renames into place, so a concurrent run
    (driver + bench) never reads a half-written tier.

    ``only`` restricts replication to the named tables (the rest
    hardlink at base size) — how the single-table mega-tiers are built
    (events×1000 for the temporal family, embeddings×1000 for the ANN
    large-index regime) without paying for a 600 M-row lineitem copy
    nobody queries."""
    import hashlib
    import shutil
    import uuid

    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.sources.loaders import (
        TABLES,
    )

    tag = ":".join(
        f"{n}={os.stat(f'{base}/{n}.parquet').st_mtime_ns}:"
        f"{os.stat(f'{base}/{n}.parquet').st_size}"
        for n in TABLES
    )
    replicated = {
        n: c for n, c in REPLICATED.items() if not only or n in only
    }
    ver = hashlib.sha256(tag.encode()).hexdigest()[:12]
    suffix = "" if not only else "_only-" + "-".join(sorted(replicated))
    final = os.path.join(
        out_root,
        f"{os.path.basename(base.rstrip('/'))}_x{mult}{suffix}_{ver}",
    )
    done_marker = os.path.join(final, ".complete")
    if os.path.exists(done_marker):
        return final
    os.makedirs(out_root, exist_ok=True)
    tier = os.path.join(out_root, f".stage-{uuid.uuid4().hex}")
    os.makedirs(tier, exist_ok=True)
    # one shared shift per FK group, derived from the max over every
    # member column so shifted keys never collide in any member table
    group_shift: dict[str, int] = {}
    for group in SHARED_SHIFT_GROUPS:
        mx = 0
        for name, cols in replicated.items():
            for c in cols:
                if c in group:
                    t = pq.read_table(f"{base}/{name}.parquet", columns=[c])
                    mx = max(mx, pc.max(t[c]).as_py())
        shift = math.ceil((mx + 1) / SHIFT_QUANTUM) * SHIFT_QUANTUM
        for c in group:
            group_shift[c] = shift
    for name in TABLES:
        src = f"{base}/{name}.parquet"
        dst = f"{tier}/{name}.parquet"
        if os.path.exists(dst):
            os.remove(dst)
        if name not in replicated:
            os.link(src, dst)
            continue
        id_cols = replicated[name]
        t = pq.read_table(src)
        shifts = {
            c: group_shift.get(c)
            or math.ceil((pc.max(t[c]).as_py() + 1) / SHIFT_QUANTUM)
            * SHIFT_QUANTUM
            for c in id_cols
        }
        copies = []
        for i in range(mult):
            shifted = t
            for c in id_cols:
                if i == 0:
                    continue
                shifted = shifted.set_column(
                    shifted.schema.get_field_index(c),
                    shifted.schema.field(c),
                    pc.add(shifted[c], i * shifts[c]),
                )
            copies.append(shifted)
        out = pa.concat_tables(copies)
        # realistic split geometry: a production N× dataset arrives as
        # many files/row-groups, so cap row groups at 64 per table —
        # a single default-sized row group would serialize the scan
        # into ONE Spark task and misrepresent every slope measured
        pq.write_table(out, dst, row_group_size=max(10_000, out.num_rows // 64))
    with open(os.path.join(tier, ".complete"), "w") as fh:
        fh.write(tag)
    try:
        os.rename(tier, final)
    except OSError:
        # only a lost concurrent-builder race leaves a complete winner
        # in place; any other failure (perms, EXDEV) must surface, not
        # silently discard the staged tier
        if not os.path.exists(done_marker):
            raise
        shutil.rmtree(tier, ignore_errors=True)
    return final


def time_spark(qfn, spark, sf_dir: str, reps: int) -> float:
    """Engine-side materialization (noop sink, same as bench.py) — a
    ``collect()`` here would time driver-transfer of the result set,
    which for wide-output queries (running windows emit one row per
    input row) dominates and mismeasures the plan by several ×."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        qfn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def time_duck(sql: str, sf_dir: str) -> float:
    """Engine-side materialization for the oracle too (temp table, not
    fetchall) so neither side pays client-transfer costs."""
    import duckdb

    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    t0 = time.perf_counter()
    con.execute(f"CREATE OR REPLACE TEMP TABLE _smoke_sink AS ({sql})")
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--queries", required=True)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--skip-duck", action="store_true")
    ap.add_argument(
        "--only",
        default="",
        help="comma list: replicate only these tables, hardlink the rest",
    )
    args = ap.parse_args()

    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark import registry
    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.session import get_spark

    qs = registry.queries()
    oracles = registry.oracle_sql()
    names = [n.strip() for n in args.queries.split(",") if n.strip()]
    tier = build_tier(
        args.base,
        args.mult,
        only=tuple(t.strip() for t in args.only.split(",") if t.strip()),
    )
    spark = get_spark("scale_smoke")

    out: dict[str, dict] = {}
    for name in names:
        row: dict[str, float | None] = {}
        row["spark_1x"] = time_spark(qs[name], spark, args.base, args.reps)
        row[f"spark_{args.mult}x"] = time_spark(qs[name], spark, tier, args.reps)
        if not args.skip_duck and name in oracles:
            row[f"duckdb_{args.mult}x"] = time_duck(oracles[name], tier)
        out[name] = row
        print(json.dumps({name: row}), flush=True)
    print(json.dumps({"tier": tier, "mult": args.mult, "results": out}))


if __name__ == "__main__":
    main()
