"""Empirical determinism sweep for every registered query.

Double-precision aggregation is summation-order sensitive; the order
changes with partitioning and task scheduling, so a query can pass the
DuckDB oracle locally and fail on the driver (q_sessionize, round 1).
This tool runs each query under several deliberately different
``spark.sql.shuffle.partitions`` settings (different partial-agg merge
trees) plus a repartitioned input, canonicalizes results at FULL float
precision (repr — shortest round-trip, equal doubles iff equal string),
and reports:

  STABLE    — bit-identical across all perturbations AND vs DuckDB
  ENGINE    — bit-stable across Spark runs but differs from DuckDB at
              full precision (driver hash may or may not tolerate)
  UNSTABLE  — Spark output changes with partitioning → will eventually
              flip a driver hash; needs integer/decimal quantization

Usage: python tools/stability_sweep.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PERTURB = [1, 7, 200]


def canon(rows, colnames) -> list[tuple]:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def cell(v):
        if isinstance(v, float):
            return repr(v)
        return str(v)

    return sorted(tuple(cell(r[i]) for i in order) for r in rows)


def fresh_session(shuffle_partitions: int):
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    return (
        SparkSession.builder.master("local[8]")
        .appName(f"stability-{shuffle_partitions}")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and not args[0].startswith("q") else "/root/testdata/sf0.01"
    only = set(a for a in args if a.startswith("q"))

    import __spark_entry__ as entrymod
    from datapipelineetl_spark import catalog

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    names = [n for n in qs if not only or n in only]

    # per-perturbation pass: one session per setting, all queries
    results: dict[str, list] = {n: [] for n in names}
    errors: dict[str, str] = {}
    for sp in PERTURB:
        spark = fresh_session(sp)
        for n in names:
            if n in errors:
                continue
            try:
                sdf = qs[n](spark, sf_dir)
                results[n].append(canon(sdf.collect(), sdf.columns))
            except Exception as e:  # noqa: BLE001
                errors[n] = f"{type(e).__name__}: {e}"

    con = duckdb.connect()
    for t in catalog.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    unstable, engine_diff, stable = [], [], []
    for n in names:
        if n in errors:
            print(f"ERROR     {n}: {errors[n]}")
            unstable.append(n)
            continue
        runs = results[n]
        if any(r != runs[0] for r in runs[1:]):
            print(f"UNSTABLE  {n}: output varies with shuffle partitioning")
            unstable.append(n)
            continue
        if n not in oracles:
            print(f"STABLE    {n} (rows-only, no oracle diff)")
            stable.append(n)
            continue
        res = con.execute(oracles[n])
        orows = res.fetchall()
        ocols = [d[0] for d in res.description]
        if canon(orows, ocols) != runs[0]:
            sc, oc = runs[0], canon(orows, ocols)
            diff = next((i for i, (a, b) in enumerate(zip(sc, oc)) if a != b), None)
            detail = f" first diff row {diff}: spark={sc[diff]} oracle={oc[diff]}" if diff is not None else ""
            print(f"ENGINE    {n}: full-precision mismatch vs DuckDB{detail}")
            engine_diff.append(n)
        else:
            print(f"STABLE    {n}")
            stable.append(n)

    print(
        f"\n{len(stable)} stable, {len(engine_diff)} engine-diff, "
        f"{len(unstable)} unstable/error of {len(names)}"
    )
    return 1 if (unstable or engine_diff) else 0


if __name__ == "__main__":
    raise SystemExit(main())
