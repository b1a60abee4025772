"""Product-quantization family (similarity.pq_fit / pq_encode /
pq_adc_topk): pure-Python trajectory replay, fold↔arrow encode parity,
measured recall gates, and the contract corners (nulls, exclusions,
validation errors)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType

from datapipelineetl_spark import catalog
from datapipelineetl_spark.operators import similarity

_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(DoubleType())),
    ]
)


def _half_up(x: float, dp: int) -> float:
    # mirrors F.round's BigDecimal(shortest-repr) HALF_UP — the contract
    # similarity._pq_half_up implements since ADVICE r12 item 3 (the old
    # floor(|x|*scale+0.5) spelling misrounds when |x|*scale FP-rounds
    # across the .5 boundary, e.g. 2.675 at dp=2)
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(x)).quantize(Decimal(1).scaleb(-dp), rounding=ROUND_HALF_UP)
    )


def _py_pq_fit(vecs: dict, m: int, k_sub: int, iters: int, dp: int):
    """Operation-for-operation replay of pq_fit: seeds = k_sub lowest-id
    subvectors (HALF_UP-rounded), sequential left-to-right distance
    sums, argmin ties to the lower code, id-ordered means HALF_UP
    rounded, empty codes keep the previous codeword."""
    ids = sorted(i for i, v in vecs.items() if v is not None)
    dim = len(vecs[ids[0]])
    sub = dim // m
    books = [
        [
            [_half_up(vecs[i][j * sub + z], dp) for z in range(sub)]
            for i in ids[:k_sub]
        ]
        for j in range(m)
    ]

    def argmin(v, book):
        best = None
        for c, cw in enumerate(book):
            d = 0.0
            for z in range(sub):
                t = v[z] - cw[z]
                d += t * t
            if best is None or d < best[0]:
                best = (d, c)
        return best[1]

    for _ in range(iters):
        sums: dict = {}
        for i in ids:
            for j in range(m):
                s = vecs[i][j * sub:(j + 1) * sub]
                c = argmin(s, books[j])
                n, acc = sums.get((j, c), (0, [0.0] * sub))
                sums[(j, c)] = (n + 1, [a + x for a, x in zip(acc, s)])
        books = [
            [
                [_half_up(a / sums[(j, c)][0], dp) for a in sums[(j, c)][1]]
                if (j, c) in sums
                else cw
                for c, cw in enumerate(book)
            ]
            for j, book in enumerate(books)
        ]
    codes = {
        i: [argmin(vecs[i][j * sub:(j + 1) * sub], books[j]) for j in range(m)]
        for i in ids
    }
    return books, codes


# deterministic "random" fixture: an LCG so there is no RNG import and
# the values exercise non-trivial geometry; ids 3/7 are exact
# duplicates (argmin tie coverage), id 9 is a NULL vector
def _fixture_vecs(n: int = 10, dim: int = 8) -> dict:
    state = 12345
    out = {}
    for i in range(n):
        v = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) % (2 ** 31)
            v.append(round(state / 2 ** 31 - 0.5, 3))
        out[i] = v
    out[7] = list(out[3])
    out[9] = None
    return out


_M, _KSUB, _ITERS, _DP = 2, 3, 2, 6


@pytest.fixture(scope="module")
def pq_frame(spark):
    vecs = _fixture_vecs()
    rows = [(i, v) for i, v in sorted(vecs.items())]
    # ONE partition: the replay sums means in id order; a multi-partition
    # partial-agg merge order would differ in the last ulp
    return vecs, spark.createDataFrame(rows, _SCHEMA).coalesce(1)


def test_pq_fit_encode_matches_python_replay(pq_frame):
    vecs, df = pq_frame
    books = similarity.pq_fit(df, m=_M, k_sub=_KSUB, iters=_ITERS, round_dp=_DP)
    py_books, py_codes = _py_pq_fit(vecs, _M, _KSUB, _ITERS, _DP)
    assert books == py_books
    enc = similarity.pq_encode(df, books)
    got = {r.vec_id: r.pq_code for r in enc.collect()}
    assert got[9] is None  # NULL vector → NULL code, no crash
    assert {i: c for i, c in got.items() if c is not None} == py_codes
    # exact duplicates quantize identically (and the tie went the same way)
    assert got[3] == got[7]


def test_pq_adc_matches_python_replay(pq_frame):
    vecs, df = pq_frame
    books = similarity.pq_fit(df, m=_M, k_sub=_KSUB, iters=_ITERS, round_dp=_DP)
    _, py_codes = _py_pq_fit(vecs, _M, _KSUB, _ITERS, _DP)
    sub = len(books[0][0])
    q = vecs[0]
    lut = []
    for j in range(_M):
        row = []
        for cw in books[j]:
            d = 0.0
            for z in range(sub):
                t = q[j * sub + z] - cw[z]
                d += t * t
            row.append(d)
        lut.append(row)
    py = sorted(
        (
            _half_up(sum(lut[j][c] for j, c in enumerate(py_codes[i])), _DP),
            i,
        )
        for i in py_codes
        if i != 0
    )
    enc = similarity.pq_encode(df, books)
    got = similarity.pq_adc_topk(
        enc, q, books, k=len(py), round_dp=_DP, exclude_ids=(0,)
    ).collect()
    assert [(r.adc, r.vec_id) for r in got] == py
    # null-coded rows are excluded, not crashed on
    assert all(r.vec_id != 9 for r in got)


def test_pq_encode_arrow_matches_fold(spark, sf_dir):
    emb = catalog.load(spark, sf_dir, "embeddings")
    with_null = emb.unionByName(
        spark.createDataFrame([(10**9, None)], _SCHEMA).withColumn(
            "label", F.lit(None).cast("int")
        )
    )
    books = similarity.pq_fit(emb, m=16, k_sub=16, iters=1)
    fold = {
        r.vec_id: r.pq_code
        for r in similarity.pq_encode(with_null, books, mode="fold").collect()
    }
    arrow = {
        r.vec_id: r.pq_code
        for r in similarity.pq_encode(with_null, books, mode="arrow").collect()
    }
    assert fold == arrow
    assert fold[10**9] is None


def test_pq_fit_arrow_matches_fold(spark, sf_dir):
    """pq_fit(assignment="arrow") routes each iteration's argmin through
    the matmul kernel instead of the literal fold (whose expression
    tree OOMs executors at m=8/k_sub=256 — SCALING.md round 12). On the
    fixture the two must produce IDENTICAL codebooks (no distance ties
    at fixture geometry, and the mean agg is shared)."""
    emb = catalog.load(spark, sf_dir, "embeddings")
    fold = similarity.pq_fit(emb, m=16, k_sub=16, iters=2, assignment="fold")
    arrow = similarity.pq_fit(emb, m=16, k_sub=16, iters=2, assignment="arrow")
    assert fold == arrow
    with pytest.raises(ValueError, match="assignment"):
        similarity.pq_fit(emb, m=16, assignment="nope")


def test_pq_adc_recall_and_refine(spark, sf_dir):
    """Pin the MEASURED fixture recall (geometry = the staged
    q_pq_codes/q_pq_topk one): adc recall@10 was 0.5 and refine_n=50
    re-rank 0.9 when this gate was written — floors one notch below so
    legitimate float drift cannot flake the suite, while a broken
    encode/LUT (recall ≈ 0.1 at m=4/k_sub=8 before the geometry
    sweep) still fails loudly."""
    import numpy as np

    emb = catalog.load(spark, sf_dir, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    x = np.array([r.embedding for r in rows], dtype=np.float64)
    q = x[ids == 0][0]
    d2 = ((x - q) ** 2).sum(axis=1)
    mask = ids != 0
    exact10 = set(
        int(i) for i in ids[mask][np.lexsort((ids[mask], d2[mask]))][:10]
    )
    books = similarity.pq_fit(emb, m=16, k_sub=16, iters=1)
    enc = similarity.pq_encode(emb, books)
    adc10 = set(
        r.vec_id
        for r in similarity.pq_adc_topk(
            enc, list(q), books, k=10, exclude_ids=(0,)
        ).collect()
    )
    assert len(adc10 & exact10) / 10 >= 0.4
    refined = similarity.pq_adc_topk(
        enc, list(q), books, k=10, exclude_ids=(0,), refine_n=50, vectors=emb
    ).collect()
    assert len(set(r.vec_id for r in refined) & exact10) / 10 >= 0.8
    # the refine leg re-ranks by EXACT distance: l2 ascending, and every
    # exact distance is <= the next one (ties broken by id)
    l2s = [(r.l2, r.vec_id) for r in refined]
    assert l2s == sorted(l2s)


def test_pq_validation_errors(pq_frame):
    _, df = pq_frame
    with pytest.raises(ValueError, match="not divisible"):
        similarity.pq_fit(df, m=3)
    with pytest.raises(ValueError, match="non-null vectors"):
        similarity.pq_fit(df, m=2, k_sub=100)
    books = similarity.pq_fit(df, m=_M, k_sub=_KSUB, iters=_ITERS)
    with pytest.raises(ValueError, match="mode"):
        similarity.pq_encode(df, books, mode="nope")
    with pytest.raises(ValueError, match="query dim"):
        similarity.pq_adc_topk(df, [0.0] * 5, books)
    with pytest.raises(ValueError, match="vectors"):
        similarity.pq_adc_topk(
            similarity.pq_encode(df, books), [0.0] * 8, books, refine_n=5
        )


def test_ivfpq_topk_composition(spark, sf_dir):
    """IVF-PQ = coarse pruning × ADC compression: (a) the persisted-
    column path (ivf_assign + pq_encode written once) returns the SAME
    result as the on-the-fly path; (b) the probe genuinely prunes (the
    scanned subset is a strict, cell-complete subset); (c) refine_n
    recovers most of the exact top-10 at fixture geometry (measured
    0.8 when this gate was written; floored a notch below)."""
    import numpy as np

    emb = catalog.load(spark, sf_dir, "embeddings")
    cents = similarity.ivf_fit_centroids(emb, k_cells=8, iters=2)
    books = similarity.pq_fit(emb, m=16, k_sub=16, iters=1)
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first().embedding]

    fly = similarity.ivfpq_topk(
        emb, q, cents, books, k=10, nprobe=3, exclude_ids=(0,)
    ).collect()
    stored = similarity.pq_encode(
        similarity.ivf_assign(emb, cents), books, out="pq_code", mode="arrow"
    )
    persisted = similarity.ivfpq_topk(
        stored, q, cents, books, k=10, nprobe=3,
        cell_col="ivf_cell", codes_col="pq_code", exclude_ids=(0,),
    ).collect()
    assert [(r.vec_id, r.adc) for r in fly] == [
        (r.vec_id, r.adc) for r in persisted
    ]

    # pruning: the probed subset is exactly the 3 nearest cells' rows
    c = np.asarray(cents)
    probe = set(
        int(x) for x in np.argsort(-(c @ np.asarray(q)), kind="stable")[:3]
    )
    cell_counts = {
        r.ivf_cell: r.n
        for r in stored.groupBy("ivf_cell").agg(F.count("*").alias("n")).collect()
    }
    scanned = sum(n for cell, n in cell_counts.items() if cell in probe)
    assert 0 < scanned < sum(cell_counts.values())
    # every returned id must live in a probed cell
    got_cells = {
        r.ivf_cell
        for r in stored.join(
            spark.createDataFrame(
                [(x.vec_id,) for x in fly], "vec_id long"
            ),
            "vec_id",
            "semi",
        ).collect()
    }
    assert got_cells <= probe

    # refine against raw vectors inside the probed set
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    x = np.array([r.embedding for r in rows], dtype=np.float64)
    d2 = ((x - np.asarray(q)) ** 2).sum(axis=1)
    mask = ids != 0
    exact10 = set(
        int(i) for i in ids[mask][np.lexsort((ids[mask], d2[mask]))][:10]
    )
    refined = similarity.ivfpq_topk(
        stored, q, cents, books, k=10, nprobe=8,  # all cells: isolates PQ error
        cell_col="ivf_cell", codes_col="pq_code",
        exclude_ids=(0,), refine_n=50,
    ).collect()
    assert len(set(r.vec_id for r in refined) & exact10) / 10 >= 0.7


def test_ivfpq_partition_pruning_plan(spark, sf_dir, tmp_path):
    """The persisted-store contract (examples/ann_index_build.py): on a
    store written partitionBy(ivf_cell), ivfpq_topk's cell predicate
    must reach the scan as a PartitionFilter — directory pruning, the
    100 TB claim — and return the same rows as the unpartitioned
    path."""
    emb = catalog.load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = similarity.ivf_fit_centroids(emb, k_cells=8, iters=2)
    books = similarity.pq_fit(emb, m=16, k_sub=16, iters=1)
    enc = similarity.pq_encode(similarity.ivf_assign(emb, cents), books,
                               mode="arrow")
    path = str(tmp_path / "store")
    enc.write.partitionBy("ivf_cell").parquet(path)
    store = spark.read.parquet(path)
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first().embedding]
    pruned = similarity.ivfpq_topk(
        store, q, cents, books, k=10, nprobe=3,
        cell_col="ivf_cell", codes_col="pq_code", exclude_ids=(0,),
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters:")[1].split("]")[0]
    assert "ivf_cell" in pf
    flat = similarity.ivfpq_topk(
        enc, q, cents, books, k=10, nprobe=3,
        cell_col="ivf_cell", codes_col="pq_code", exclude_ids=(0,),
    )
    assert [(r.vec_id, r.adc) for r in pruned.collect()] == [
        (r.vec_id, r.adc) for r in flat.collect()
    ]


def _blob_frame(spark, k=4, per=200, dim=16, seed=11):
    import numpy as np

    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, dim)) * 2.0
    x = np.concatenate(
        [centers[i] + 0.15 * rng.normal(size=(per, dim)) for i in range(k)]
    )
    # interleave blob membership so the lowest-id seeds span blobs
    order = np.argsort(np.tile(np.arange(per), k) * k + np.repeat(np.arange(k), per))
    x = x[order]
    rows = [(int(i), [float(v) for v in x[i]]) for i in range(len(x))]
    return x, spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(4).localCheckpoint(eager=True)


def test_ivf_l2_metric_and_residualize_roundtrip(spark):
    """The Euclidean coarse tier: metric="l2" fits UN-normalized
    centroids with L2-argmin assignment (numpy-replayed), and
    residualize satisfies residual + centroid[cell] == original
    exactly; NULL vectors get NULL residuals."""
    import numpy as np

    x, emb = _blob_frame(spark)
    cents = similarity.ivf_fit_centroids(emb, k_cells=4, iters=2, metric="l2")
    c = np.asarray(cents)
    # un-normalized (blob centers live at radius ~2*sqrt(dim), not 1)
    assert (np.abs(np.linalg.norm(c, axis=1) - 1.0) > 0.1).all()
    got = {
        r.vec_id: r.ivf_cell
        for r in similarity.ivf_assign(emb, cents, metric="l2").collect()
    }
    expect = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    assert all(got[i] == int(expect[i]) for i in range(len(x)))

    res = similarity.residualize(emb, cents, metric="l2")
    row = res.filter(F.col("vec_id") == 7).first()
    back = [a + b for a, b in zip(row.residual, cents[got[7]])]
    assert all(abs(a - b) < 1e-12 for a, b in zip(back, row.embedding))
    with_null = emb.unionByName(
        spark.createDataFrame([(10**9, None)], _SCHEMA)
    )
    nrow = (
        similarity.residualize(with_null, cents, metric="l2")
        .filter(F.col("vec_id") == 10**9)
        .first()
    )
    assert nrow.residual is None
    with pytest.raises(ValueError, match="metric"):
        similarity.ivf_fit_centroids(emb, k_cells=4, metric="dot")


def test_ivfpq_residual_beats_global_at_low_code_budget(spark):
    """The measured characterization (SCALING.md round 12): on CLUSTERED
    data with an L2 coarse tier and a LOW code budget (m=4, k_sub=8 —
    4 bytes/vector), residual codes see the small within-cell
    displacements the global codebook wastes its codewords spanning:
    measured recall@10 0.30 vs 0.12 at this exact geometry (floors a
    notch below; both paths share every other knob)."""
    import numpy as np

    x, emb = _blob_frame(spark)
    ids = np.arange(len(x))
    cents = similarity.ivf_fit_centroids(emb, k_cells=4, iters=3, metric="l2")
    books_g = similarity.pq_fit(emb, m=4, k_sub=8, iters=1)
    books_r = similarity.pq_fit(
        similarity.residualize(emb, cents), m=4, k_sub=8, iters=1,
        vec_col="residual",
    )
    stored = similarity.ivf_assign(emb, cents, metric="l2")
    sg = similarity.pq_encode(stored, books_g, mode="arrow")
    sr = similarity.pq_encode(
        similarity.residualize(stored, cents, cell_col="ivf_cell"),
        books_r, "residual", "pq_code", mode="arrow",
    )
    rg = rr = 0.0
    qids = [0, 3, 250, 500, 701]
    for qid in qids:
        q = [float(v) for v in x[qid]]
        d2 = ((x - x[qid]) ** 2).sum(axis=1)
        mask = ids != qid
        ex = set(int(i) for i in ids[mask][np.lexsort((ids[mask], d2[mask]))][:10])
        g = set(
            r.vec_id
            for r in similarity.ivfpq_topk(
                sg, q, cents, books_g, k=10, nprobe=1,
                cell_col="ivf_cell", codes_col="pq_code",
                exclude_ids=(qid,), coarse_metric="l2",
            ).collect()
        )
        r_ = set(
            r.vec_id
            for r in similarity.ivfpq_residual_topk(
                sr, q, cents, books_r, k=10, nprobe=1,
                cell_col="ivf_cell", codes_col="pq_code",
                exclude_ids=(qid,), coarse_metric="l2",
            ).collect()
        )
        rg += len(g & ex) / 10
        rr += len(r_ & ex) / 10
    rg, rr = rg / len(qids), rr / len(qids)
    assert rr >= rg + 0.1
    assert rr >= 0.2


def test_ivf_topk_l2_metric_scores_by_l2(spark):
    """ivf_topk(metric="l2") must rank by squared L2 (the geometry that
    probed), matching the numpy exact ranking within the probed cells —
    not by cosine (a vector can be cosine-close yet L2-far)."""
    import numpy as np

    x, emb = _blob_frame(spark)
    ids = np.arange(len(x))
    cents = similarity.ivf_fit_centroids(emb, k_cells=4, iters=3, metric="l2")
    qid = 42
    q = [float(v) for v in x[qid]]
    got = similarity.ivf_topk(
        emb, q, cents, k=10, nprobe=4, exclude_ids=(qid,), metric="l2"
    ).collect()
    assert got[0].l2 <= got[-1].l2  # ascending distance
    d2 = ((x - x[qid]) ** 2).sum(axis=1)
    mask = ids != qid
    exact = [int(i) for i in ids[mask][np.lexsort((ids[mask], d2[mask]))][:10]]
    # nprobe=4 of 4 cells == exhaustive: must equal the exact ranking
    assert [r.vec_id for r in got] == exact


def test_ivfpq_residual_onthefly_and_partition_pruning(spark, tmp_path):
    """The residual variant's remaining contracts: (a) the on-the-fly
    path (no precomputed cell/code columns) equals the persisted-store
    path; (b) on a store written partitionBy(ivf_cell), every probed
    branch's scan carries a PartitionFilter on ivf_cell (directory
    pruning survives the per-cell LUT union)."""
    x, emb = _blob_frame(spark)
    cents = similarity.ivf_fit_centroids(emb, k_cells=4, iters=3, metric="l2")
    books = similarity.pq_fit(
        similarity.residualize(emb, cents), m=4, k_sub=8, iters=1,
        vec_col="residual",
    )
    q = [float(v) for v in x[5]]
    fly = similarity.ivfpq_residual_topk(
        emb, q, cents, books, k=10, nprobe=2, exclude_ids=(5,)
    ).collect()

    stored = similarity.pq_encode(
        similarity.residualize(
            similarity.ivf_assign(emb, cents, metric="l2"), cents,
            cell_col="ivf_cell",
        ),
        books, "residual", "pq_code", mode="arrow",
    ).drop("residual")
    path = str(tmp_path / "res_store")
    stored.write.partitionBy("ivf_cell").parquet(path)
    store = spark.read.parquet(path)
    pruned = similarity.ivfpq_residual_topk(
        store, q, cents, books, k=10, nprobe=2,
        cell_col="ivf_cell", codes_col="pq_code", exclude_ids=(5,),
    )
    assert [(r.vec_id, r.adc) for r in pruned.collect()] == [
        (r.vec_id, r.adc) for r in fly
    ]
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    scans = plan.count("PartitionFilters: [")
    pruned_scans = sum(
        "ivf_cell" in part.split("]")[0]
        for part in plan.split("PartitionFilters:")[1:]
    )
    assert scans >= 2 and pruned_scans == scans  # every branch prunes


def test_pq_half_up_matches_spark_round(spark):
    """ADVICE r12 item 3: the Python seed-rounding path must agree with
    Spark F.round on ADVERSARIAL values, not just fixture-friendly ones
    — especially where |x|*scale FP-rounds across the .5 boundary
    (2.675*100 = 267.4999…97: the old floor spelling gave 2.67, F.round
    gives 2.68) and on exact .5s in both signs (banker's-rounding trap).
    One round-trip through a literal column checks the JVM digits."""
    cases = [
        (2.675, 2), (-2.675, 2), (1.005, 2), (0.125, 2), (-0.125, 2),
        (0.5, 0), (-0.5, 0), (2.5, 0), (1.0000005, 6), (-1.0000005, 6),
        (0.3333333333333333, 6), (267.49999999999997, 0),
        (8.835, 2), (-8.835, 2), (1e-7, 6), (-1e-7, 6), (0.0, 3),
    ]
    got = spark.range(1).select(
        *[
            F.round(F.lit(x), dp).alias(f"c{i}")
            for i, (x, dp) in enumerate(cases)
        ]
    ).collect()[0]
    for i, (x, dp) in enumerate(cases):
        assert similarity._pq_half_up(x, dp) == got[f"c{i}"], (x, dp)


def test_l2_topk_null_vectors_and_round_dp(spark):
    """ADVICE r12 item 2: a NULL embedding must be FILTERED, not sorted
    to the top of the ascending top-k by Spark's NULLS FIRST default
    (DuckDB's NULLS LAST would exclude it — a silent cross-engine
    mismatch). And round_dp threads like the PQ family's (VERDICT r12
    cosmetic #4)."""
    rows = [
        (0, [0.0, 0.0]),
        (1, [1.0, 0.0]),
        (2, None),
        (3, [0.5, 0.5]),
        (4, [3.0, 4.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = similarity.l2_topk(df, [0.0, 0.0], k=3, exclude_ids=(0,)).collect()
    assert [r.vec_id for r in got] == [3, 1, 4]
    assert all(r.l2 is not None for r in got)
    coarse = similarity.l2_topk(
        df, [0.1234567, 0.0], k=1, exclude_ids=(0, 2, 3, 4), round_dp=2
    ).collect()[0]
    assert coarse.l2 == similarity._pq_half_up((1 - 0.1234567) ** 2, 2)


def test_ivfpq_residual_refine_shortlist_wider_than_branches(spark):
    """ADVICE r12 item 1 (the failure scenario verbatim): with per-cell
    branches capped at k, refine_n=16/k=2/nprobe=1 silently re-ranked a
    2-candidate shortlist. Degenerate single-codeword codebooks make
    every ADC distance tie (shortlist order = vec_id), and the true
    nearest neighbor carries the HIGHEST id — only a shortlist that
    actually reaches refine_n candidates lets the exact re-rank find
    it."""
    dim, n = 4, 16
    rows = [(i, [10.0 + i, float(i % 3), 0.0, 0.0]) for i in range(1, n)]
    rows.append((n, [0.1, 0.0, 0.0, 0.0]))  # true nearest to q, max id
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [[0.0] * dim]  # one coarse cell → nprobe=1 probes everything
    books = [[[0.0, 0.0]], [[0.0, 0.0]]]  # m=2, k_sub=1: all codes/ADC tie
    q = [0.0] * dim
    got = similarity.ivfpq_residual_topk(
        df, q, cents, books, k=2, nprobe=1, refine_n=n
    ).collect()
    assert [r.vec_id for r in got] == [n, 1]
    assert got[0].l2 == similarity._pq_half_up(0.1 ** 2, 6)


def test_ivf_assign_fold_matches_arrow_and_handles_nulls(spark):
    """ivf_assign_fold is the oracle-replayable L2 assigner: same cells
    as the Arrow kernel on tie-free geometry, NULL vectors → NULL cell,
    and ties go to the LOWER cell id (first-index-of-min) — pinned with
    two equidistant centroids."""
    rows = [
        (0, [0.0, 0.0]), (1, [10.0, 0.0]), (2, [0.1, 0.2]),
        (3, [9.8, 0.4]), (4, None), (5, [5.0, 0.0]),  # 5 ties 0 vs 1
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [[0.0, 0.0], [10.0, 0.0]]
    fold = {r.vec_id: r.ivf_cell
            for r in similarity.ivf_assign_fold(df, cents).collect()}
    assert fold == {0: 0, 1: 1, 2: 0, 3: 1, 4: None, 5: 0}
    arrow = {r.vec_id: r.ivf_cell
             for r in similarity.ivf_assign(df, cents, metric="l2").collect()}
    # tie row 5 excluded: the kernels agree there too (np.argmin is
    # also first-min) but that is implementation luck, not contract
    assert {i: c for i, c in fold.items() if i != 5} == \
        {i: c for i, c in arrow.items() if i != 5}


def test_pq_adc_topk_multi_modes_match_single(spark, sf_dir):
    """pq_adc_topk_multi must reproduce pq_adc_topk per query in BOTH
    modes (fold = unioned literal-LUT branches; arrow = one mapInPandas
    pass with partition-local top-k), including the self-exclusion."""
    emb = catalog.load(spark, sf_dir, "embeddings")
    books = similarity.pq_fit(emb, m=16, k_sub=16, iters=1)
    enc = similarity.pq_encode(emb, books).repartition(4)
    vecs = {r.vec_id: r.embedding
            for r in emb.filter(F.col("vec_id") < 3).collect()}
    queries = {int(i): [float(x) for x in v] for i, v in vecs.items()}
    expected = []
    for qid in sorted(queries):
        expected += [
            (qid, r.vec_id, r.adc)
            for r in similarity.pq_adc_topk(
                enc, queries[qid], books, k=7, exclude_ids=(qid,)
            ).collect()
        ]
    for mode in ("fold", "arrow"):
        got = [
            (r.query_id, r.vec_id, r.adc)
            for r in similarity.pq_adc_topk_multi(
                enc, queries, books, k=7, mode=mode
            ).orderBy("query_id", "adc", "vec_id").collect()
        ]
        assert got == sorted(expected, key=lambda t: (t[0], t[2], t[1])), mode
    # no self-exclusion: each query's own vector is its 0-distance top hit
    inc = similarity.pq_adc_topk_multi(
        enc, queries, books, k=1, mode="arrow", exclude_query_ids=False
    ).collect()
    assert {(r.query_id, r.vec_id) for r in inc} == {(q, q) for q in queries}
    with pytest.raises(ValueError, match="mode"):
        similarity.pq_adc_topk_multi(enc, queries, books, mode="nope")
    with pytest.raises(ValueError, match="query"):
        similarity.pq_adc_topk_multi(enc, {}, books)


def test_pq_adc_topk_multi_matches_python_replay(pq_frame):
    """Pure-Python replay of the multi-query fold path (the batch-20
    oracle's guarantee, pinned locally the way the single-query path
    is): every (query, vector) ADC is the j-ordered sequential sum of
    LUT lookups over the replayed codes, HALF_UP-rounded; per-query
    rank ascending, ties to the lower id, self excluded."""
    vecs, df = pq_frame
    books = similarity.pq_fit(df, m=_M, k_sub=_KSUB, iters=_ITERS, round_dp=_DP)
    _, py_codes = _py_pq_fit(vecs, _M, _KSUB, _ITERS, _DP)
    sub = len(books[0][0])
    queries = {i: vecs[i] for i in (0, 3, 5)}

    def lut(q):
        out = []
        for j in range(_M):
            row = []
            for cw in books[j]:
                d = 0.0
                for z in range(sub):
                    t = q[j * sub + z] - cw[z]
                    d += t * t
                row.append(d)
            out.append(row)
        return out

    expected = []
    for qid, q in sorted(queries.items()):
        tbl = lut(q)
        scored = sorted(
            (
                _half_up(sum(tbl[j][c] for j, c in enumerate(py_codes[i])), _DP),
                i,
            )
            for i in py_codes
            if i != qid
        )[:4]
        expected += [(qid, i, adc) for adc, i in scored]
    enc = similarity.pq_encode(df, books)
    got = [
        (r.query_id, r.vec_id, r.adc)
        for r in similarity.pq_adc_topk_multi(enc, queries, books, k=4)
        .orderBy("query_id", "adc", "vec_id")
        .collect()
    ]
    assert got == expected
    # and vec 9 (NULL code) appears nowhere
    assert all(v != 9 for _, v, _ in got)


def test_ivfpq_topk_multi_modes_match_single(spark, sf_dir, tmp_path):
    """ivfpq_topk_multi must reproduce ivfpq_topk per query in BOTH
    modes over a PERSISTED cell-partitioned store, each query scoring
    only its own probed cells, and the shared scan must prune to the
    UNION of probed cells (PartitionFilters in the plan)."""
    emb = catalog.load(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    cents = similarity.ivf_fit_centroids(emb, k_cells=8, iters=2, dim=dim)
    books = similarity.pq_fit(emb, m=16, k_sub=16, iters=1)
    path = str(tmp_path / "store")
    similarity.pq_encode(
        similarity.ivf_assign(emb, cents), books, mode="arrow"
    ).write.partitionBy("ivf_cell").parquet(path)
    store = spark.read.parquet(path)
    vecs = {r.vec_id: [float(x) for x in r.embedding]
            for r in emb.filter(F.col("vec_id") < 3).collect()}
    expected = []
    for qid in sorted(vecs):
        expected += [
            (qid, r.vec_id, r.adc)
            for r in similarity.ivfpq_topk(
                store, vecs[qid], cents, books, k=5, nprobe=3,
                cell_col="ivf_cell", codes_col="pq_code", exclude_ids=(qid,),
            ).collect()
        ]
    expected.sort(key=lambda t: (t[0], t[2], t[1]))
    for mode in ("fold", "arrow"):
        multi = similarity.ivfpq_topk_multi(
            store, vecs, cents, books, k=5, nprobe=3,
            cell_col="ivf_cell", codes_col="pq_code", mode=mode,
        )
        got = [
            (r.query_id, r.vec_id, r.adc)
            for r in multi.orderBy("query_id", "adc", "vec_id").collect()
        ]
        assert got == expected, mode
        plan = multi._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan and "ivf_cell" in plan.split(
            "PartitionFilters:"
        )[1].split("]")[0]
    with pytest.raises(ValueError, match="query"):
        similarity.ivfpq_topk_multi(store, {}, cents, books)


def test_ivfpq_topk_multi_refine_matches_single(spark, sf_dir):
    """The batched two-stage search: ivfpq_topk_multi(refine_n) must
    equal per-query ivfpq_topk(refine_n) in BOTH modes — same exact-l2
    re-rank, same output columns — with one broadcast join re-ranking
    ALL queries' shortlists together."""
    emb = catalog.load(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    cents = similarity.ivf_fit_centroids(emb, k_cells=8, iters=2, dim=dim)
    books = similarity.pq_fit(emb, m=16, k_sub=16, iters=1)
    work = similarity.pq_encode(
        similarity.ivf_assign(emb, cents), books, mode="arrow"
    )
    vecs = {r.vec_id: [float(x) for x in r.embedding]
            for r in emb.filter(F.col("vec_id") < 2).collect()}
    expected = []
    for qid in sorted(vecs):
        expected += [
            (qid, r.vec_id, r.adc, r.l2)
            for r in similarity.ivfpq_topk(
                work, vecs[qid], cents, books, k=5, nprobe=3,
                cell_col="ivf_cell", codes_col="pq_code",
                exclude_ids=(qid,), refine_n=25,
            ).collect()
        ]
    expected.sort(key=lambda t: (t[0], t[3], t[1]))
    for mode in ("fold", "arrow"):
        got = [
            (r.query_id, r.vec_id, r.adc, r.l2)
            for r in similarity.ivfpq_topk_multi(
                work, vecs, cents, books, k=5, nprobe=3,
                cell_col="ivf_cell", codes_col="pq_code",
                mode=mode, refine_n=25,
            ).orderBy("query_id", "l2", "vec_id").collect()
        ]
        assert got == expected, mode


def test_ivf_assign_fold_matches_python_replay_random(spark):
    """Property replay of the oracle-grade coarse assigner (the
    primitive q_ivfpq_topk's full value replay stands on): random
    small-grid vectors and centroids — including exact duplicates, so
    distance TIES occur — assigned by pure Python using the same
    sequential left-to-right squared-sum order and the same
    first-minimum (ties to the lower cell) rule. Exact equality, not
    approx: both sides run identical IEEE double operations in
    identical order."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    dim = 4
    grid = st.integers(min_value=-3, max_value=3)
    vec = st.lists(grid.map(lambda g: g / 4.0), min_size=dim, max_size=dim)

    @settings(max_examples=30, deadline=None)
    @given(
        vecs=st.lists(vec, min_size=1, max_size=8),
        cents=st.lists(vec, min_size=1, max_size=4),
    )
    def prop(vecs, cents):
        rows = [(i, v) for i, v in enumerate(vecs)] + [(len(vecs), None)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        got = {
            r.vec_id: r.ivf_cell
            for r in similarity.ivf_assign_fold(df, cents).collect()
        }

        def py_assign(v):
            best = None
            for c, cw in enumerate(cents):
                d = 0.0
                for x, y in zip(v, cw):
                    d += (x - y) * (x - y)
                if best is None or d < best[0]:
                    best = (d, c)
            return best[1]

        expected = {i: py_assign(v) for i, v in enumerate(vecs)}
        expected[len(vecs)] = None
        assert got == expected

    prop()


def test_round_half_up_np_boundary_divergence():
    """ADVICE r13 item 3: the Arrow serving kernels share ONE vectorized
    HALF_UP helper, and its divergence from F.round/_pq_half_up on the
    FP .5 boundary is an explicit, pinned trade — not a bug to
    rediscover. 80.585*100 = 8058.4999…9 in IEEE double, so the scaled-
    double kernel floors to 80.58 while BigDecimal HALF_UP on the
    shortest decimal gives 80.59. (The folklore 2.675 does NOT diverge:
    its product rounds to exactly 267.5 — both give 2.68.) Off-boundary
    values, negatives, and signed zeros agree exactly."""
    import numpy as np

    assert similarity._round_half_up_np(np.array([80.585]), 2)[0] == 80.58
    assert similarity._pq_half_up(80.585, 2) == 80.59  # the documented gap
    assert similarity._round_half_up_np(np.array([2.675]), 2)[0] == 2.68
    assert similarity._pq_half_up(2.675, 2) == 2.68  # folklore case agrees
    arr = np.array([1.2345675, -1.2345675, 0.0, -0.0, 2.5, -2.5, 8.835])
    got = similarity._round_half_up_np(arr.copy(), 6)
    assert got[2] == 0.0 and got[3] == 0.0
    assert not np.signbit(got[2]) and not np.signbit(got[3])
    assert got[4] == 2.5 and got[5] == -2.5
    # sign symmetry everywhere (the drift the two private copies had)
    assert np.array_equal(
        similarity._round_half_up_np(-arr.copy(), 6),
        -similarity._round_half_up_np(arr.copy(), 6) + 0.0,
    )
    off = np.array([0.1234564, -0.1234564, 267.4999, 1e-7, -1e-7])
    for x, g in zip(off, similarity._round_half_up_np(off.copy(), 6)):
        assert g == similarity._pq_half_up(float(x), 6), x


def test_refine_paths_filter_null_vectors(spark):
    """ADVICE r13 item 1: a codes-only store refined against a raw
    table that carries NULL embeddings must FILTER them before the
    exact re-rank — NULL l2 sorts ASC NULLS FIRST in Spark, ranking a
    vectorless id ABOVE every real candidate (DuckDB's NULLS LAST would
    silently diverge). Covers BOTH refine legs: pq_adc_topk's
    single-query join and _exact_rerank_multi (via ivfpq_topk_multi)."""
    dim = 4
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, None),  # the poisoned raw row
        (3, [3.0, 0.0, 0.0, 0.0]),
        (4, [2.0, 0.0, 0.0, 0.0]),
    ]
    vectors = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # degenerate single-codeword books: every ADC ties → the whole
    # corpus (incl. the NULL-embedding id) reaches the shortlist
    books = [[[0.0, 0.0]], [[0.0, 0.0]]]
    enc = vectors.select(
        "vec_id", F.array(F.lit(0), F.lit(0)).cast("array<int>").alias("pq_code")
    )
    q = [0.0] * dim
    got = similarity.pq_adc_topk(
        enc, q, books, k=3, refine_n=4, vectors=vectors
    ).collect()
    assert [r.vec_id for r in got] == [1, 4, 3]
    assert all(r.l2 is not None for r in got)

    cents = [[0.0] * dim]
    store = enc.select("vec_id", "pq_code", F.lit(0).alias("ivf_cell"))
    multi = similarity.ivfpq_topk_multi(
        store, {9: q}, cents, books, k=3, nprobe=1, cell_col="ivf_cell",
        codes_col="pq_code", refine_n=4, vectors=vectors,
        exclude_query_ids=False,
    ).collect()
    assert [r.vec_id for r in multi] == [1, 4, 3]
    assert all(r.l2 is not None for r in multi)


def test_probe_cells_sequential_fold_order():
    """ADVICE r13 item 2: _probe_cells ranks probes by the SAME
    sequential left-to-right IEEE fold the oracle's list_sum replays —
    pinned against a pure-Python fold on a near-tie grid (quarter-step
    doubles, the ivf_assign_fold property geometry) for both metrics,
    with exact ties going to the lower cell id."""
    import itertools
    import random

    rng = random.Random(14)
    dim = 3
    for _ in range(50):
        q = [rng.randrange(-8, 9) / 4.0 for _ in range(dim)]
        cents = [
            [rng.randrange(-8, 9) / 4.0 for _ in range(dim)] for _ in range(6)
        ]
        for metric in ("l2", "cosine"):
            dists = []
            for cw in cents:
                d = 0.0
                for x, y in zip(q, cw):
                    d += (x - y) * (x - y) if metric == "l2" else -(x * y)
                dists.append(d)
            expected = sorted(range(len(cents)), key=lambda i: (dists[i], i))[:3]
            assert similarity._probe_cells(cents, q, 3, metric) == expected
    # exact tie: two identical centroids → lower id probes first
    tie = [[1.0, 0.0, 0.0], [1.0, 0.0, 0.0], [9.0, 9.0, 9.0]]
    assert similarity._probe_cells(tie, [1.0, 0.0, 0.0], 2, "l2") == [0, 1]
    # cosine ranks by DESCENDING dot: [9,9,9] wins, then the 0<1 tie
    assert similarity._probe_cells(tie, [1.0, 0.0, 0.0], 3, "cosine") == [2, 0, 1]


def test_pq_adc_topk_multi_refine_matches_single(spark, sf_dir):
    """VERDICT r13 item 7a: the flat-scan batched server's two-stage
    leg. pq_adc_topk_multi(refine_n) must equal per-query
    pq_adc_topk(refine_n) in BOTH modes — same exact-l2 re-rank via the
    shared _exact_rerank_multi broadcast join, same output columns,
    shortlists max(k, refine_n) wide (the r12 width lesson)."""
    emb = catalog.load(spark, sf_dir, "embeddings")
    books = similarity.pq_fit(emb, m=16, k_sub=16, iters=1)
    enc = similarity.pq_encode(emb, books).repartition(4)
    vecs = {r.vec_id: [float(x) for x in r.embedding]
            for r in emb.filter(F.col("vec_id") < 2).collect()}
    expected = []
    for qid in sorted(vecs):
        expected += [
            (qid, r.vec_id, r.adc, r.l2)
            for r in similarity.pq_adc_topk(
                enc, vecs[qid], books, k=5, exclude_ids=(qid,),
                refine_n=25, vectors=emb,
            ).collect()
        ]
    expected.sort(key=lambda t: (t[0], t[3], t[1]))
    for mode in ("fold", "arrow"):
        got = [
            (r.query_id, r.vec_id, r.adc, r.l2)
            for r in similarity.pq_adc_topk_multi(
                enc, vecs, books, k=5, mode=mode, refine_n=25, vectors=emb,
            ).orderBy("query_id", "l2", "vec_id").collect()
        ]
        assert got == expected, mode


def test_ivfpq_residual_topk_multi_modes_match_single(spark, sf_dir, tmp_path):
    """VERDICT r13 item 7b: batched serving over a RESIDUAL store.
    ivfpq_residual_topk_multi must reproduce per-query
    ivfpq_residual_topk in BOTH modes over a persisted cell-partitioned
    residual store — per-(query,cell) LUTs, union-pruned shared scan
    (PartitionFilters asserted) — and the refine leg must match the
    single-query exact re-rank."""
    emb = catalog.load(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    cents = similarity.ivf_fit_centroids(
        emb, k_cells=8, iters=2, dim=dim, metric="l2"
    )
    assigned = similarity.ivf_assign(emb, cents, metric="l2")
    res = similarity.residualize(assigned, cents, cell_col="ivf_cell")
    books = similarity.pq_fit(res, m=16, k_sub=16, iters=1, vec_col="residual")
    path = str(tmp_path / "res_store")
    similarity.pq_encode(res, books, "residual", mode="arrow").drop(
        "residual"
    ).write.partitionBy("ivf_cell").parquet(path)
    store = spark.read.parquet(path)
    vecs = {r.vec_id: [float(x) for x in r.embedding]
            for r in emb.filter(F.col("vec_id") < 3).collect()}
    expected = []
    for qid in sorted(vecs):
        expected += [
            (qid, r.vec_id, r.adc)
            for r in similarity.ivfpq_residual_topk(
                store, vecs[qid], cents, books, k=5, nprobe=3,
                cell_col="ivf_cell", codes_col="pq_code",
                exclude_ids=(qid,),
            ).collect()
        ]
    expected.sort(key=lambda t: (t[0], t[2], t[1]))
    for mode in ("fold", "arrow"):
        multi = similarity.ivfpq_residual_topk_multi(
            store, vecs, cents, books, k=5, nprobe=3,
            cell_col="ivf_cell", codes_col="pq_code", mode=mode,
        )
        got = [
            (r.query_id, r.vec_id, r.adc)
            for r in multi.orderBy("query_id", "adc", "vec_id").collect()
        ]
        assert got == expected, mode
        plan = multi._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan and "ivf_cell" in plan.split(
            "PartitionFilters:"
        )[1].split("]")[0]
    # refine leg: exact-l2 re-rank parity against the single-query path
    # (the store kept the raw embedding column; the multi call passes
    # the raw table explicitly — the codes-only-store convention)
    exp_ref = []
    for qid in sorted(vecs):
        exp_ref += [
            (qid, r.vec_id, r.adc, r.l2)
            for r in similarity.ivfpq_residual_topk(
                store, vecs[qid], cents, books, k=5, nprobe=3,
                cell_col="ivf_cell", codes_col="pq_code",
                exclude_ids=(qid,), refine_n=20,
            ).collect()
        ]
    exp_ref.sort(key=lambda t: (t[0], t[3], t[1]))
    for mode in ("fold", "arrow"):
        got = [
            (r.query_id, r.vec_id, r.adc, r.l2)
            for r in similarity.ivfpq_residual_topk_multi(
                store, vecs, cents, books, k=5, nprobe=3,
                cell_col="ivf_cell", codes_col="pq_code", mode=mode,
                refine_n=20, vectors=emb,
            ).orderBy("query_id", "l2", "vec_id").collect()
        ]
        assert got == exp_ref, mode
    with pytest.raises(ValueError, match="query"):
        similarity.ivfpq_residual_topk_multi(store, {}, cents, books)
    with pytest.raises(ValueError, match="mode"):
        similarity.ivfpq_residual_topk_multi(
            store, vecs, cents, books, mode="nope"
        )
