"""Driver-style DuckDB oracle verification for the STAGED batch-11
queries (corpus operators) — the same comparison the round driver runs
(row count + column names + order-insensitive sorted-column value
compare), executed locally until the queries get round-6 window slots.

Kept separate from the live registry on purpose: queries_batch11 stages
into its own dicts so importing it here cannot grow ``queries()``
mid-round (see its module docstring)."""

from __future__ import annotations

import duckdb
import pytest

from datapipelineetl_spark import catalog
from datapipelineetl_spark import queries_batch11 as b11


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in catalog.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def cell(v):
        return repr(v) if isinstance(v, float) else str(v)

    return sorted(tuple(cell(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(b11.STAGED_QUERIES))
def test_staged_query_matches_oracle(spark, sf_dir, duck, name):
    sdf = b11.STAGED_QUERIES[name](spark, sf_dir)
    srows, scols = sdf.collect(), sdf.columns
    res = duck.execute(b11.STAGED_ORACLES[name])
    orows = res.fetchall()
    ocols = [d[0] for d in res.description]
    assert len(srows) == len(orows), f"{name}: rowcount {len(srows)} != {len(orows)}"
    assert sorted(scols) == sorted(ocols), f"{name}: columns {scols} != {ocols}"
    sc, oc = _canon(srows, scols), _canon(orows, ocols)
    if sc != oc:
        diff = next(i for i, (a, b) in enumerate(zip(sc, oc)) if a != b)
        raise AssertionError(
            f"{name}: value mismatch at sorted-row {diff}: {sc[diff]} vs {oc[diff]}"
        )
    assert len(srows) > 0, f"{name}: degenerate empty result"


def test_staged_registry_is_isolated():
    """Importing batch11 must NOT grow the live queries() surface (the
    driver verifies the first 50 entries; staged queries wait for their
    round-6 window slots)."""
    from datapipelineetl_spark import queries as q

    assert not (set(b11.STAGED_QUERIES) & set(q.QUERIES))
    assert set(b11.STAGED_ORACLES) <= set(b11.STAGED_QUERIES)
    assert len(b11.STAGED_QUERIES) == 10
