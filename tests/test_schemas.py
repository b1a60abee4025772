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
