"""Result-schema type parity audit: Spark dtype vs DuckDB type per column,
for every oracle-checked query. The driver's t2 gate compares schemas;
int-vs-BIGINT drift passes a stringified value compare but may fail a typed
one — this catches it early.

Usage: python tools/check_types.py [sf_dir]
       python tools/check_types.py --staged [sf_dir]   # + staged batteries
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod
from datapipelineetl_spark import catalog
from datapipelineetl_spark.session import get_session

# duckdb type (base) → acceptable spark dtypes
COMPAT = {
    "BIGINT": {"bigint"},
    "INTEGER": {"int"},
    "DOUBLE": {"double"},
    "FLOAT": {"float"},
    "VARCHAR": {"string"},
    "TIMESTAMP": {"timestamp", "timestamp_ntz"},
    "DATE": {"date"},
    "BOOLEAN": {"boolean"},
    "HUGEINT": {"bigint"},
    "INTEGER[]": {"array<int>"},
    "BIGINT[]": {"array<bigint>"},
    "DOUBLE[]": {"array<double>"},
    "VARCHAR[]": {"array<string>"},
}


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    staged = "--staged" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    spark = get_session("type-audit")
    con = duckdb.connect()
    for t in catalog.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    if staged:
        # a dtype drift in a STAGED query should be caught before its
        # promotion takes a window slot, not after
        from datapipelineetl_spark import queries_batch17 as b17
        from datapipelineetl_spark import queries_batch18 as b18

        qs = {**qs, **b17.STAGED_QUERIES, **b18.STAGED_QUERIES}
        oracles = {**oracles, **b17.STAGED_ORACLES, **b18.STAGED_ORACLES}
    bad = 0
    for name, fn in sorted(qs.items()):
        if name not in oracles:
            continue
        try:
            sd = dict(fn(spark, sf_dir).dtypes)
            rel = con.sql(oracles[name])
            od = dict(zip(rel.columns, [str(t) for t in rel.types]))
        except Exception as e:  # noqa: BLE001
            print(f"ERR   {name}: {e}")
            bad += 1
            continue
        for c, ot in od.items():
            base = ot.split("(")[0]
            if sd.get(c) not in COMPAT.get(base, {base.lower()}):
                print(f"MISMATCH {name}.{c}: spark={sd.get(c)} duckdb={ot}")
                bad += 1
    print(f"{'FAIL' if bad else 'OK'}: {bad} type mismatches")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
