"""Tests for operational sinks: dynamic partition upsert + compaction."""

from __future__ import annotations

from pathlib import Path

from datapipelineetl_spark.sinks import maintenance


def test_overwrite_partitions_is_idempotent_and_scoped(spark, tmp_path):
    out = str(tmp_path / "t")
    day1 = spark.createDataFrame([("d1", 1), ("d1", 2)], ["day", "v"])
    day2 = spark.createDataFrame([("d2", 10)], ["day", "v"])
    maintenance.overwrite_partitions(day1, out, ["day"])
    maintenance.overwrite_partitions(day2, out, ["day"])
    # replay day1 with corrected data: must replace d1 only, keep d2
    day1_fixed = spark.createDataFrame([("d1", 99)], ["day", "v"])
    maintenance.overwrite_partitions(day1_fixed, out, ["day"])
    got = {(r.day, r.v) for r in spark.read.parquet(out).collect()}
    assert got == {("d1", 99), ("d2", 10)}
    # running the same write again changes nothing (idempotent)
    maintenance.overwrite_partitions(day1_fixed, out, ["day"])
    assert {(r.day, r.v) for r in spark.read.parquet(out).collect()} == got


def test_compact_reduces_file_count(spark, tmp_path):
    out = str(tmp_path / "frag")
    # 20 tiny files
    spark.range(2000).repartition(20).write.parquet(out)
    before = len(list(Path(out).rglob("*.parquet")))
    assert before >= 20
    n = maintenance.compact(spark, out, target_file_bytes=1 << 30)
    after = len(list(Path(out).rglob("*.parquet")))
    assert n == 1 and after == 1
    assert spark.read.parquet(out).count() == 2000


def test_compact_preserves_partition_layout(spark, tmp_path):
    out = str(tmp_path / "part")
    df = spark.createDataFrame(
        [("a", i) for i in range(100)] + [("b", i) for i in range(100)], ["p", "v"]
    )
    df.repartition(10).write.partitionBy("p").parquet(out)
    maintenance.compact(spark, out, target_file_bytes=1 << 30, partition_cols=["p"])
    dirs = {d.name for d in Path(out).iterdir() if d.is_dir()}
    assert {"p=a", "p=b"} <= dirs
    assert spark.read.parquet(out).count() == 200


def test_compact_swap_leaves_no_temp_dirs(spark, tmp_path):
    """The rename-swap must clean up both the __compacting temp and the
    __old safety copy, and the data must survive the swap."""
    out = str(tmp_path / "sw")
    df = spark.createDataFrame([(i, i * 2) for i in range(100)], ["k", "v"])
    df.repartition(10).write.parquet(out)
    maintenance.compact(spark, out)
    assert not Path(out + "__compacting").exists()
    assert not Path(out + "__old").exists()
    assert spark.read.parquet(out).count() == 100


def test_merge_upsert_updates_inserts_preserves(spark, tmp_path):
    """Keyed MERGE: same-key rows replaced, new keys inserted, untouched
    keys preserved; replaying the identical merge changes nothing."""
    store = str(tmp_path / "dim")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["k", "name", "v"]
    )
    maintenance.merge_upsert(spark, store, base, ["k"])
    upd = spark.createDataFrame([(2, "B", 99), (4, "d", 40)], ["k", "name", "v"])
    maintenance.merge_upsert(spark, store, upd, ["k"])
    got = {r.k: (r.name, r.v) for r in spark.read.parquet(store).collect()}
    assert got == {1: ("a", 10), 2: ("B", 99), 3: ("c", 30), 4: ("d", 40)}
    maintenance.merge_upsert(spark, store, upd, ["k"])  # replay → same state
    again = {r.k: (r.name, r.v) for r in spark.read.parquet(store).collect()}
    assert again == got


def test_merge_upsert_partitioned_touches_only_update_partitions(spark, tmp_path):
    """With partition_cols, the merge must leave data FILES of untouched
    partitions physically in place (cost ∝ update footprint)."""
    store = str(tmp_path / "facts")
    base = spark.createDataFrame(
        [("2024-01-01", 1, 10), ("2024-01-01", 2, 20), ("2024-01-02", 3, 30)],
        ["day", "k", "v"],
    )
    maintenance.merge_upsert(spark, store, base, ["k"], partition_cols=["day"])
    before = {p.name for p in (Path(store) / "day=2024-01-02").glob("*.parquet")}
    upd = spark.createDataFrame([("2024-01-01", 2, 99)], ["day", "k", "v"])
    maintenance.merge_upsert(spark, store, upd, ["k"], partition_cols=["day"])
    after = {p.name for p in (Path(store) / "day=2024-01-02").glob("*.parquet")}
    assert after == before  # untouched partition not rewritten
    got = {r.k: r.v for r in spark.read.parquet(store).collect()}
    assert got == {1: 10, 2: 99, 3: 30}


def test_merge_upsert_cdc_latest_row_wins(spark, tmp_path):
    store = str(tmp_path / "cdc")
    base = spark.createDataFrame([(1, 0, "old")], ["k", "seq", "val"])
    maintenance.merge_upsert(spark, store, base, ["k"])
    cdc = spark.createDataFrame(
        [(1, 5, "mid"), (1, 9, "new"), (2, 1, "x")], ["k", "seq", "val"]
    )
    maintenance.merge_upsert(spark, store, cdc, ["k"], order_col="seq")
    got = {r.k: r.val for r in spark.read.parquet(store).collect()}
    assert got == {1: "new", 2: "x"}


def test_schema_evolution_merge_on_read(spark, tmp_path):
    """A long-lived store whose later files gained a column must read
    whole with mergeSchema (old rows null-fill) — and the narrower
    default read stays cheap (no footer merge) when the new column is
    not needed. The add-a-column migration every 100 TB table lives
    through."""
    store = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], ["k", "v"]).write.parquet(store)
    spark.createDataFrame([(2, "b", 99)], ["k", "v", "extra"]).write.mode(
        "append"
    ).parquet(store)
    merged = spark.read.option("mergeSchema", "true").parquet(store)
    assert set(merged.columns) == {"k", "v", "extra"}
    got = {r.k: r.extra for r in merged.collect()}
    assert got == {1: None, 2: 99}


def test_merge_upsert_partition_moving_key(spark, tmp_path):
    """keys_partition_stable=False: an update that moves a key to a new
    partition value must remove the stale row from the OLD partition —
    including deleting a partition the move emptied entirely."""
    store = str(tmp_path / "moving")
    base = spark.createDataFrame(
        [("d1", 1, 10), ("d1", 2, 20), ("d3", 3, 30)], ["day", "k", "v"]
    )
    maintenance.merge_upsert(spark, store, base, ["k"], partition_cols=["day"])
    # k=1 moves d1 -> d2; k=3 moves d3 -> d2 (emptying d3 entirely)
    upd = spark.createDataFrame([("d2", 1, 99), ("d2", 3, 33)], ["day", "k", "v"])
    maintenance.merge_upsert(
        spark, store, upd, ["k"], partition_cols=["day"], keys_partition_stable=False
    )
    got = {(r.day, r.k): r.v for r in spark.read.parquet(store).collect()}
    assert got == {("d2", 1): 99, ("d1", 2): 20, ("d2", 3): 33}
    assert not (Path(store) / "day=d3").exists()  # emptied partition gone


def test_merge_upsert_moving_key_with_hive_escaped_partition_values(spark, tmp_path):
    """ADVICE r5 medium: partition values Spark Hive-escapes in directory
    names (':' → %3A; null → __HIVE_DEFAULT_PARTITION__) must still have
    their emptied partitions deleted — the raw f"{col}={value}" path
    never matched such directories and silently left the stale files."""
    import datetime

    store = str(tmp_path / "escaped")
    t1 = datetime.datetime(2024, 1, 1, 12, 30, 0)
    t2 = datetime.datetime(2024, 1, 2, 7, 45, 0)
    base = spark.createDataFrame(
        [(t1, 1, 10), (t2, 2, 20), (None, 3, 30)], ["stamp", "k", "v"]
    )
    maintenance.merge_upsert(spark, store, base, ["k"], partition_cols=["stamp"])
    # the ':'-bearing timestamp dir really is escaped on disk
    assert any("%3A" in p.name for p in Path(store).iterdir() if p.is_dir())
    # k=1 moves t1 -> t2 (emptying t1); k=3 moves null -> t2 (emptying the
    # __HIVE_DEFAULT_PARTITION__ dir)
    upd = spark.createDataFrame([(t2, 1, 99), (t2, 3, 33)], ["stamp", "k", "v"])
    maintenance.merge_upsert(
        spark, store, upd, ["k"], partition_cols=["stamp"],
        keys_partition_stable=False,
    )
    got = {(r.stamp, r.k): r.v for r in spark.read.parquet(store).collect()}
    assert got == {(t2, 1): 99, (t2, 2): 20, (t2, 3): 33}
    dirs = {p.name for p in Path(store).iterdir() if p.is_dir()}
    assert not any("__HIVE_DEFAULT_PARTITION__" in d for d in dirs)
    assert len([d for d in dirs if d.startswith("stamp=")]) == 1  # only t2 left


def test_merge_upsert_moving_key_with_float_partition_values(spark, tmp_path):
    """ADVICE r6 low: double partition values render Java-style on disk
    ('1.0E-7') but Python-style from collect ('1e-07'), so the emptied-
    partition deletion used to raise 'not found on disk' spuriously.
    Floats now match by parsed value."""
    store = str(tmp_path / "floats")
    base = spark.createDataFrame(
        [(1e-07, 1, 10), (0.5, 2, 20)], "thr double, k int, v int"
    )
    maintenance.merge_upsert(spark, store, base, ["k"], partition_cols=["thr"])
    # k=1 moves 1e-07 -> 0.5, emptying the 1e-07 partition entirely
    upd = spark.createDataFrame([(0.5, 1, 99)], "thr double, k int, v int")
    maintenance.merge_upsert(
        spark, store, upd, ["k"], partition_cols=["thr"],
        keys_partition_stable=False,
    )
    got = {(r.thr, r.k): r.v for r in spark.read.parquet(store).collect()}
    assert got == {(0.5, 1): 99, (0.5, 2): 20}
    dirs = {p.name for p in Path(store).iterdir() if p.name.startswith("thr=")}
    assert len(dirs) == 1  # the emptied 1.0E-7 partition is gone


def test_merge_upsert_unpartitioned_swap_never_leaves_store_absent(spark, tmp_path):
    """ADVICE r5 low: the unpartitioned full-rewrite must use compact()'s
    rename-aside swap so a crash window never has the store missing; after
    a successful merge no __merging/__old residue remains."""
    store = str(tmp_path / "flat")
    base = spark.createDataFrame([(1, 10), (2, 20)], ["k", "v"])
    maintenance.merge_upsert(spark, store, base, ["k"])
    upd = spark.createDataFrame([(2, 99), (3, 30)], ["k", "v"])
    maintenance.merge_upsert(spark, store, upd, ["k"])
    got = {r.k: r.v for r in spark.read.parquet(store).collect()}
    assert got == {1: 10, 2: 99, 3: 30}
    siblings = {p.name for p in (tmp_path).iterdir()}
    assert siblings == {"flat"}  # no __merging / __old left behind


def test_compact_ann_store_collapses_batches_preserving_content(spark, tmp_path):
    """VERDICT r12 item 3: compaction must collapse historical
    __batch_id subpartitions into ONE per cell, leave newer batches and
    query answers untouched, keep ivf_cell the top-level (prunable)
    partition, and be idempotent on re-run (the crash-rerun contract)."""
    from pyspark.sql import functions as F

    from datapipelineetl_spark.operators import similarity

    store = str(tmp_path / "store")
    dim = 8
    rows = [
        (i, [((i * 29 + z * 11) % 89) / 89.0 - 0.5 for z in range(dim)])
        for i in range(48)
    ]
    base = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = similarity.ivf_fit_centroids(base, k_cells=3, iters=2, dim=dim)
    books = similarity.pq_fit(base, m=2, k_sub=4, iters=1, dim=dim)
    enc = similarity.pq_encode(similarity.ivf_assign(base, cents), books)
    for b in range(4):  # 4 "micro-batches" of 12 rows each
        maintenance.overwrite_partitions(
            enc.filter((F.col("vec_id") >= b * 12) & (F.col("vec_id") < (b + 1) * 12))
            .withColumn("__batch_id", F.lit(b)),
            store,
            ["ivf_cell", "__batch_id"],
        )

    def canon():
        return sorted(
            (r.vec_id, r.ivf_cell, tuple(r.pq_code))
            for r in spark.read.parquet(store).collect()
        )

    def batch_dirs():
        return sorted(
            (c, b)
            for (c, b) in maintenance._parse_partition_dirs(
                store, ["ivf_cell", "__batch_id"]
            )
        )

    before = canon()
    q = rows[5][1]
    query = lambda: [
        (r.vec_id, r.adc)
        for r in similarity.ivfpq_topk(
            spark.read.parquet(store), q, cents, books, k=5, nprobe=2,
            cell_col="ivf_cell", codes_col="pq_code", exclude_ids=(5,),
        ).collect()
    ]
    answers = query()
    assert len({b for (_, b) in batch_dirs()}) == 4

    removed = maintenance.compact_ann_store(spark, store, upto_batch_id=2)
    assert removed > 0
    assert canon() == before  # content unchanged, only layout
    assert query() == answers
    remaining = {b for (_, b) in batch_dirs()}
    assert remaining == {"-1", "3"}  # 0..2 collapsed, 3 untouched
    # idempotent re-run: nothing left to collapse, content stable
    assert maintenance.compact_ann_store(spark, store, upto_batch_id=2) == 0
    assert canon() == before


def test_compact_ann_store_dedupes_checkpoint_loss_duplicates(spark, tmp_path):
    """ADVICE r12 item 4's recovery path: after checkpoint loss a
    re-grouped replay lands the SAME vec_ids under NEW batch ids next
    to the stale partitions; compaction's keep-newest-__batch_id dedup
    by vec_id must collapse them back to one row per vector."""
    from pyspark.sql import functions as F

    from datapipelineetl_spark.operators import similarity

    store = str(tmp_path / "store")
    dim = 4
    rows = [(i, [float(i), float(i % 5), 0.0, 0.0]) for i in range(20)]
    base = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = similarity.ivf_fit_centroids(base, k_cells=2, iters=1, dim=dim)
    books = similarity.pq_fit(base, m=2, k_sub=2, iters=1, dim=dim)
    enc = similarity.pq_encode(similarity.ivf_assign(base, cents), books)
    # original run: batches 0,1 of 10 rows; replay after checkpoint
    # loss: ONE batch 2 carrying all 20 rows (different file grouping)
    for b in range(2):
        maintenance.overwrite_partitions(
            enc.filter((F.col("vec_id") >= b * 10) & (F.col("vec_id") < (b + 1) * 10))
            .withColumn("__batch_id", F.lit(b)),
            store,
            ["ivf_cell", "__batch_id"],
        )
    maintenance.overwrite_partitions(
        enc.withColumn("__batch_id", F.lit(2)), store, ["ivf_cell", "__batch_id"]
    )
    dup = spark.read.parquet(store)
    assert dup.count() == 40  # the documented duplication
    maintenance.compact_ann_store(spark, store, upto_batch_id=2)
    got = spark.read.parquet(store)
    assert got.count() == 20
    expected = sorted((r.vec_id, r.ivf_cell, tuple(r.pq_code)) for r in enc.collect())
    assert sorted((r.vec_id, r.ivf_cell, tuple(r.pq_code)) for r in got.collect()) \
        == expected


def test_compact_ann_store_residual_layout(spark, tmp_path):
    """compact_ann_store is layout-agnostic: a RESIDUAL-code store
    (streaming_ann_index(residual=True)'s layout — codes coupled to the
    frozen L2 coarse tier) compacts with content and pruned
    ivfpq_residual_topk answers unchanged."""
    from pyspark.sql import functions as F

    from datapipelineetl_spark.operators import similarity

    store = str(tmp_path / "store")
    dim = 8
    rows = [
        (i, [((i * 41 + z * 13) % 83) / 83.0 - 0.5 for z in range(dim)])
        for i in range(36)
    ]
    base = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = similarity.ivf_fit_centroids(
        base, k_cells=3, iters=2, dim=dim, metric="l2"
    )
    books = similarity.pq_fit(
        similarity.residualize(base, cents, metric="l2"),
        m=2, k_sub=4, iters=1, vec_col="residual", dim=dim,
    )
    enc = similarity.pq_encode(
        similarity.residualize(
            similarity.ivf_assign(base, cents, metric="l2"),
            cents, cell_col="ivf_cell", out="__res", metric="l2",
        ),
        books, "__res",
    ).drop("__res")
    for b in range(3):
        maintenance.overwrite_partitions(
            enc.filter((F.col("vec_id") >= b * 12) & (F.col("vec_id") < (b + 1) * 12))
            .withColumn("__batch_id", F.lit(b)),
            store,
            ["ivf_cell", "__batch_id"],
        )
    q = rows[7][1]

    def answers():
        return [
            (r.vec_id, r.adc)
            for r in similarity.ivfpq_residual_topk(
                spark.read.parquet(store), q, cents, books, k=5, nprobe=2,
                cell_col="ivf_cell", codes_col="pq_code", exclude_ids=(7,),
            ).collect()
        ]

    before = answers()
    removed = maintenance.compact_ann_store(spark, store, upto_batch_id=2)
    assert removed > 0
    assert answers() == before
    assert spark.read.parquet(store).count() == 36
