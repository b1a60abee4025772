"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry at sf0.01 and compares against its
``oracle_sql()`` twin: row count, column names/types, and an
order-insensitive value hash (rows sorted after stringifying, columns
sorted by name — mirroring the documented driver behavior). Exit 0 iff
everything matches. Use while iterating; the driver's own check is the
gate of record.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
       python tools/check_correctness.py --staged [sf_dir] [query ...]

``--staged`` ALSO checks the STAGED batteries (batches 11–13 were
promoted rounds 6–8; batch 14 awaits r9 window slots) with the same
comparison.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod
from datapipelineetl_spark import catalog
from datapipelineetl_spark.queries import driver_unsafe_cols
from datapipelineetl_spark.session import get_session


def canon(rows, colnames) -> list[tuple]:
    # Full-precision repr (NOT %.9g): the driver's hash is stricter than
    # 9 significant digits, so the local gate must be at least as strict
    # or local green stops predicting driver green.
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def cell(v):
        if isinstance(v, float):
            return repr(v)
        return str(v)

    return sorted(tuple(cell(r[i]) for i in order) for r in rows)


# DuckDB output types that common client paths (pandas .df(), some Arrow
# conversions) stringify differently from Spark's long/int — e.g. HUGEINT
# → float64 "3.0" vs Spark "3". Cast these away in the oracle SQL.
# This is a HARD FAILURE (was a warning through r3 — the q12 HUGEINT miss
# shipped past the printed warning; VERDICT r3 item 2 promoted it).
_RISKY_DUCK_TYPES = {"HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT", "FLOAT"}


def risky_oracle_types(con, name: str, sql: str) -> list[tuple[str, str]]:
    """Columns of ``sql`` whose DuckDB type stringifies driver-riskily."""
    try:
        rel = con.sql(sql)
        return [
            (c, str(t)) for c, t in zip(rel.columns, rel.types) if str(t) in _RISKY_DUCK_TYPES
        ]
    except Exception:  # noqa: BLE001 — the execute path reports oracle errors
        return []


def main() -> int:
    flags = {"--default-session", "--staged"}
    args = [a for a in sys.argv[1:] if a not in flags]
    default_session = "--default-session" in sys.argv[1:]
    staged = "--staged" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    if default_session:
        # true driver simulation: the round driver builds its OWN session
        # with stock confs (Spark 4 ANSI on, no engine tuning) — queries
        # must not depend on session flags
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").appName(
            "correctness-check-default"
        ).getOrCreate()
    else:
        spark = get_session("correctness-check")
    con = duckdb.connect()
    for t in catalog.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    if staged:
        # discover every queries_batch* module (the __spark_entry__
        # _extension_tier pattern) — a hand-kept import list silently
        # skips a newly staged battery (the r12 b19 near-miss)
        import importlib
        import pkgutil

        import datapipelineetl_spark as _pkg

        for info in pkgutil.iter_modules(_pkg.__path__):
            if not info.name.startswith("queries_batch"):
                continue
            mod = importlib.import_module(f"datapipelineetl_spark.{info.name}")
            qs = {**qs, **getattr(mod, "STAGED_QUERIES", {})}
            oracles = {**oracles, **getattr(mod, "STAGED_ORACLES", {})}
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failed.append(name)
            continue
        # HARD FAILURE (the r7 q_encode_tokens miss: the local str()-canon
        # happily stringifies Python lists, the driver's pandas lexsort
        # crashes on them — local green must predict driver green)
        unsafe = driver_unsafe_cols(sdf.schema)
        if unsafe:
            print(
                f"FAIL  {name}: driver-unhashable output columns {unsafe}; "
                "md5-digest the collection or posexplode to scalar rows"
            )
            failed.append(name)
            continue
        if name not in oracles:
            print(f"rows-only  {name}: {len(srows)} rows")
            continue
        bad_types = risky_oracle_types(con, name, oracles[name])
        if bad_types:
            print(
                f"FAIL  {name}: oracle emits driver-risky types {bad_types}; "
                "add explicit CASTs (e.g. CAST(... AS BIGINT))"
            )
            failed.append(name)
            continue
        try:
            res = con.execute(oracles[name])
            orows = res.fetchall()
            ocols = [d[0] for d in res.description]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {e}")
            failed.append(name)
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={sorted(scols)} oracle={sorted(ocols)}")
        if not problems:
            sc, oc = canon(srows, scols), canon(orows, ocols)
            if sc != oc:
                diff = next(
                    (i for i, (a, b) in enumerate(zip(sc, oc)) if a != b), None
                )
                msg = "value mismatch"
                if diff is not None:
                    msg += f" first at sorted-row {diff}: spark={sc[diff]} oracle={oc[diff]}"
                problems.append(msg)
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"OK    {name}: {len(srows)} rows")
    print(f"\n{len(qs) - len(failed)}/{len(qs)} pass")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
