from __future__ import annotations

from datapipelineetl_spark.schemas import (
    CELL_METRICS_SCHEMA,
    KPI_GZIP_SCHEMA,
    KPI_XMLHARD_SCHEMA,
    KPI_XMLONLY_SCHEMA,
    sanitize_columns,
    sanitize_name,
)


def test_sanitize_name_pathological():
    assert sanitize_name("FT_UL.Interference") == "FT_UL_Interference"
    assert (
        sanitize_name("FT_AVE 4G/LTE DL USER THRPUT without Last TTI(ALL) (KBPS)(kbit/s)")
        == "FT_AVE_4G_LTE_DL_USER_THRPUT_without_Last_TTI_ALL_KBPS_kbit_s"
    )
    assert sanitize_name("FT_PHYSICAL RESOURCE BLOCKS LOAD DL(%)") == "FT_PHYSICAL_RESOURCE_BLOCKS_LOAD_DL"
    assert sanitize_name("123abc") == "c_123abc"
    assert sanitize_name("  ") == "col"


def test_sanitize_columns_collision(spark):
    df = spark.createDataFrame([(1, 2, 3)], ["a b", "a.b", "a_b"])
    out, mapping = sanitize_columns(df)
    assert len(set(mapping.values())) == 3
    assert out.columns == list(mapping.values())


def test_schema_shapes():
    assert len(CELL_METRICS_SCHEMA) == 15
    assert len(KPI_GZIP_SCHEMA) == 9
    assert KPI_XMLONLY_SCHEMA.names[-1] == "nodeid"
    assert KPI_XMLHARD_SCHEMA.names[-1] == "localDn"


def test_driver_check_window_contract():
    """The driver verifies the FIRST 50 queries() entries. The rotation
    invariant (VERDICT r2 item 4, r3 item 3), derived from the latest
    recorded correctness file rather than a hand-pinned name list: every
    registered query must be either green in the newest CORRECTNESS_r*.json
    or inside the current window — i.e. no query's newest driver row is
    ever allowed to age past 2 rounds."""
    import json
    import re
    from pathlib import Path

    import __spark_entry__ as entrymod

    qs = list(entrymod.queries())
    oracles = entrymod.oracle_sql()
    assert len(entrymod.PRIORITY) == 50
    assert len(set(entrymod.PRIORITY)) == 50
    assert qs[:50] == entrymod.PRIORITY
    # every priority name must actually be registered
    assert set(entrymod.PRIORITY) <= set(qs)
    window = set(qs[:50])
    repo = Path(entrymod.__file__).resolve().parent
    latest = max(
        repo.glob("CORRECTNESS_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
    )
    rec = json.loads(latest.read_text())
    green = {n for n, row in rec.items() if row.get("hash_match") or
             (row.get("rows_match") and "hash_match" not in row)}
    stale = [q for q in qs if q not in window and q not in green]
    assert not stale, (
        f"queries aging past 2 rounds (not in window, not green in "
        f"{latest.name}): {stale}"
    )
    # any red row in the latest record must be re-verified this round
    red = {n for n in rec if n in set(qs) and n not in green}
    assert red <= window, f"red rows left out of the window: {red - window}"
    # oracle dict must follow the same ordering for driver-side zip —
    # compare the FULL sequence, not just the head (r2 advice)
    assert [n for n in qs if n in oracles] == list(oracles)
