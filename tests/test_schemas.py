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
    """The driver verifies the FIRST 50 queries() entries. PRIORITY must
    fill that window exactly: every round-1-unchecked query, the fixed
    q_sessionize, and one representative per family (VERDICT.md item 1)."""
    import __spark_entry__ as entrymod

    qs = list(entrymod.queries())
    oracles = entrymod.oracle_sql()
    assert len(entrymod.PRIORITY) == 50
    assert len(set(entrymod.PRIORITY)) == 50
    assert qs[:50] == entrymod.PRIORITY
    # every priority name must actually be registered
    assert set(entrymod.PRIORITY) <= set(qs)
    # §2.11 LLM tier must sit inside the window
    llm = {"q_dedup_token_set", "q_minhash_near_dups", "q_dedup_clusters",
           "q_simhash", "q_cosine_topk", "q_cosine_near_pairs", "q_tf_idf",
           "q_lang_id", "q_text_quality", "q_text_token_stats",
           "q_ann_lsh_topk", "q_ann_recall"}
    assert llm <= set(qs[:50])
    assert "q_sessionize" in qs[:50]
    # oracle dict must follow the same ordering for driver-side zip
    assert [n for n in qs if n in oracles][:1] == [n for n in oracles][:1]
