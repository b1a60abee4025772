"""Similarity search over embedding columns (SURVEY.md §2.11).

Two tiers:

- **Brute-force cosine** (`cosine_topk`, `cosine_pairs`) — exact baseline.
  The dot product is ``F.zip_with`` + ``F.aggregate`` array math (JVM-side,
  no Python). Top-k against a query vector is a narrow map +
  TakeOrderedAndProject: perfectly scalable (one pass, no shuffle beyond
  the k-row heap merge). All-pairs is O(n²) — correct at fixture scale,
  and the explicit baseline the ANN tier is measured against.

- **ANN via random-hyperplane LSH** (`ann_lsh_topk`) — the scale path.
  Sign-bit signatures bucket vectors so the pairwise work happens only
  within buckets (multi-probe = compare against all buckets at Hamming
  distance ≤ 1 of the query's signature). Recall/latency trades via
  ``num_planes``. Hyperplanes are derived deterministically from a seed so
  runs are reproducible.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_ids: tuple[int, ...] = (),
) -> DataFrame:
    """Exact top-k by cosine against a constant query vector.

    The query vector is a literal array (broadcast by constant folding);
    scoring is a narrow projection; ordering+limit compiles to
    TakeOrderedAndProject — a per-partition k-heap, no global sort.

    Zero-norm vectors are EXCLUDED from the candidate set (ADVICE r14):
    their cosine is 0/0, which under the driver's ANSI session is a
    DIVIDE_BY_ZERO error and in the Arrow kernels a NaN that numpy and
    Spark rank OPPOSITELY under DESC — undefined similarity has no
    place in a top-k either way. The same squared-norm predicate also
    drops NULL vectors (a NULL fold compares NULL to 0 → filtered), so
    every cosine tier shares one candidate rule; pinned by
    ``test_cosine_family_excludes_zero_norm_vectors``.
    """
    vec = F.col(vec_col).cast("array<double>")
    norm_sq = F.aggregate(vec, F.lit(0.0), lambda acc, v: acc + v * v)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.filter(norm_sq != 0).select(
        F.col(id_col),
        F.round(cosine(vec, q), 4).alias("cos_sim"),
    )
    if exclude_ids:
        scored = scored.filter(~F.col(id_col).isin(*exclude_ids))
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


def l2_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_ids: tuple[int, ...] = (),
    round_dp: int = 6,
) -> DataFrame:
    """Exact top-k by SQUARED L2 distance against a constant query
    vector — the Euclidean twin of ``cosine_topk`` (same plan shape:
    literal query, narrow fold scoring, TakeOrderedAndProject k-heap;
    ordering on the ROUNDED distance, ties to the lower id, so the
    result order is hash-stable cross-engine).

    NULL vectors are filtered before scoring (the ``pq_adc_topk``
    isNotNull discipline): a NULL embedding scores NULL, which Spark's
    ASC default (NULLS FIRST) would place ABOVE every real neighbor
    while DuckDB's default (NULLS LAST) excludes it — a silent
    cross-engine mismatch and a polluted top-k the moment a fixture
    carries null embeddings. ``round_dp`` is threaded like the PQ
    family's so the two tiers can never silently diverge in rounding."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    vec = F.col(vec_col).cast("array<double>")
    scored = df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col),
        F.round(
            F.aggregate(
                F.zip_with(vec, q, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, d: acc + d,
            ),
            round_dp,
        ).alias("l2"),
    )
    if exclude_ids:
        scored = scored.filter(~F.col(id_col).isin(*exclude_ids))
    return scored.orderBy("l2", id_col).limit(k)


def l2_topk_multi(
    df: DataFrame,
    queries: dict[int, list[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_query_ids: bool = True,
    round_dp: int = 6,
    mode: str = "fold",
) -> DataFrame:
    """Exact squared-L2 top-k for a BATCH of queries in one operator —
    the brute-force serving shape (the expensive thing is scanning the
    raw vectors, so scan them ONCE for all Q requests). Output
    (query_id, id_col, l2), each query's top-k ascending rounded l2,
    ties to the lower id — per-query rows identical to ``l2_topk``
    (parity-tested). NULL vectors are filtered (the ``l2_topk``
    isNotNull discipline).

    ``mode`` is the ``pq_adc_topk_multi`` split:

    - ``"fold"`` (oracle path): Q ``l2_topk`` branches — literal query,
      sequential zip_with fold, TakeOrderedAndProject heap — over the
      same scan, unioned under a query_id column.
    - ``"arrow"``: ONE mapInPandas pass — per Arrow batch the kernel
      stacks the vectors once and computes ALL Q distance columns via
      the ‖x‖² − 2·X@Qᵀ + ‖q‖² expansion (one matmul instead of Q
      folds), emits local top-k per query, so the global re-rank
      shuffles ≤ partitions × Q × k rows. Rounding is the shared
      vectorized HALF_UP kernel and the matmul re-associates the sum —
      the same last-ulp trade every Arrow kernel here makes
      (parity-tested on the fixture).
    """
    return _exact_topk_multi(
        df, queries, k, id_col, vec_col, exclude_query_ids, round_dp,
        mode, metric="l2",
    )


def cosine_topk_multi(
    df: DataFrame,
    queries: dict[int, list[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_query_ids: bool = True,
    mode: str = "fold",
) -> DataFrame:
    """Batched ``cosine_topk``: output (query_id, id_col, cos_sim),
    each query's top-k DESCENDING rounded similarity (4 dp, the
    ``cosine_topk`` contract), ties to the lower id. Same mode split
    and cost shape as ``l2_topk_multi`` — arrow mode's matmul computes
    all Q similarity columns from one stacked batch. NULL vectors are
    filtered in both modes (``cosine_topk`` leaves them to DESC
    NULLS LAST, which never reaches a top-k; the batched kernel drops
    them explicitly)."""
    return _exact_topk_multi(
        df, queries, k, id_col, vec_col, exclude_query_ids, 4,
        mode, metric="cosine",
    )


def _exact_topk_multi(
    df: DataFrame,
    queries: dict[int, list[float]],
    k: int,
    id_col: str,
    vec_col: str,
    exclude_query_ids: bool,
    round_dp: int,
    mode: str,
    metric: str,
) -> DataFrame:
    """Shared engine for the batched exact top-k pair — fold = unioned
    single-query branches (oracle-grade), arrow = one stacked-matmul
    mapInPandas pass with partition-local per-query heaps."""
    if not queries:
        raise ValueError("need at least one query")
    if mode not in ("fold", "arrow"):
        raise ValueError(f"mode must be 'fold' or 'arrow', got {mode!r}")
    id_t = _validated_id_type(df, id_col)
    qids = sorted(queries)
    score_col = "l2" if metric == "l2" else "cos_sim"
    if mode == "fold":
        out = None
        for qid in qids:
            excl = (qid,) if exclude_query_ids else ()
            if metric == "l2":
                branch = l2_topk(
                    df, queries[qid], k, id_col, vec_col, excl, round_dp
                )
            else:
                branch = cosine_topk(
                    df.filter(F.col(vec_col).isNotNull()),
                    queries[qid], k, id_col, vec_col, excl,
                )
            branch = branch.select(
                F.lit(int(qid)).cast("int").alias("query_id"),
                F.col(id_col),
                F.col(score_col),
            )
            out = branch if out is None else out.unionByName(branch)
        return out

    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    dim = len(queries[qids[0]])
    qm = np.asarray([queries[qid] for qid in qids], dtype=np.float64)  # Q×dim
    qid_arr = np.asarray(qids, dtype=np.int64)
    q_norm = np.sqrt((qm * qm).sum(axis=1))
    q_sq = (qm * qm).sum(axis=1)
    asc = metric == "l2"

    def gen(batches):
        for pdf in batches:
            x, null_mask = _stack_nullable(pdf[vec_col].to_numpy(), dim)
            keep0 = ~null_mask
            if metric == "cosine":
                # zero-norm rows score 0/0 → NaN, which numpy ranks
                # LAST while Spark's DESC ranks NaN FIRST (ADVICE r14)
                # — excluded from candidates, the cosine_topk rule
                keep0 &= (x * x).sum(axis=1) > 0
            if not keep0.any():
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)[keep0]
            x = x[keep0]
            if metric == "l2":
                scores = (
                    (x * x).sum(axis=1)[:, None]
                    - 2.0 * (x @ qm.T)
                    + q_sq[None, :]
                )
            else:
                scores = (x @ qm.T) / (
                    np.sqrt((x * x).sum(axis=1))[:, None] * q_norm[None, :]
                )
            r = _round_half_up_np(scores, round_dp)
            parts = []
            for qi, qid in enumerate(qid_arr):
                keep = np.ones(len(ids), dtype=bool)
                if exclude_query_ids:
                    keep = ids != qid
                col = r[keep, qi]
                order = np.lexsort((ids[keep], col if asc else -col))[:k]
                parts.append(
                    pd.DataFrame(
                        {
                            "query_id": np.full(
                                int(order.size), qid, dtype=np.int32
                            ),
                            id_col: ids[keep][order],
                            score_col: col[order],
                        }
                    )
                )
            yield pd.concat(parts, ignore_index=True)

    local = df.select(id_col, vec_col).mapInPandas(
        gen, schema=f"query_id int, {id_col} {id_t}, {score_col} double"
    )
    order_col = F.col(score_col).asc() if asc else F.col(score_col).desc()
    w = Window.partitionBy("query_id").orderBy(order_col, F.col(id_col))
    return (
        local.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def cosine_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine ≥ threshold (exact, O(n²) cross join).

    Correctness baseline / fixture-scale tool. At 100 TB use
    ``ann_lsh_topk`` or pre-bucket by an LSH signature equi-join instead —
    same output contract, candidate-pruned.
    """
    v = df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(cosine(F.col("a.v"), F.col("b.v")), 4).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def _stack_nullable(vecs, dim: int):
    """Stack an Arrow batch of array<double> values into a dense
    (batch × dim) float64 matrix, tolerating NULL rows: nulls become
    zero rows and the returned boolean mask marks them so callers emit
    null outputs instead of crashing ``np.stack`` (embedding columns
    legitimately carry nulls — decode failures, filtered docs)."""
    import numpy as np  # noqa: PLC0415

    rows = []
    mask = np.zeros(len(vecs), dtype=bool)
    zero = np.zeros(dim, dtype=np.float64)
    for i, v in enumerate(vecs):
        if v is None or (isinstance(v, float) and v != v):
            mask[i] = True
            rows.append(zero)
        else:
            rows.append(np.asarray(v, dtype=np.float64))
    m = np.stack(rows) if rows else np.zeros((0, dim), dtype=np.float64)
    return m, mask


_INTEGRAL_TYPES = ("tinyint", "smallint", "int", "bigint")


def _validated_id_type(df: DataFrame, id_col: str) -> str:
    """Spark type name of ``id_col``, validated integral — the batched
    serving family (``*_topk_multi``) keys requests by integer query
    id, excludes self-neighbors via ``ids != qid``, and upcasts ids to
    int64 inside its Arrow kernels, so a non-integral id column must
    fail fast HERE instead of erroring (or silently casting) deep in
    Arrow conversion (ADVICE r14 — the resize_media id-dtype lesson
    applied family-wide). The returned name feeds each kernel's
    mapInPandas output schema, so arrow mode preserves the input's
    integer width exactly like fold mode's pass-through column does."""
    t = df.schema[id_col].dataType.simpleString()
    if t not in _INTEGRAL_TYPES:
        raise TypeError(
            f"batched serving requires an integral id column; {id_col!r} "
            f"is {t} — cast the id (or use the single-query operator, "
            "which carries any id type through untouched)"
        )
    return t


def cosine_scores_pandas(
    df: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out: str = "cos_sim",
) -> DataFrame:
    """Vectorized (Arrow-batched pandas UDF) cosine against a fixed query —
    the numpy path for kernels the JVM can't express (here it CAN:
    ``cosine()`` above is the production JVM version; this exists as the
    documented escape hatch and is asserted equal to it in tests).

    Scale: the batch matrix-multiplies in numpy (one BLAS call per Arrow
    batch) — this is what 'Pandas UDFs beat row-at-a-time Python by
    10-100×' means concretely; a row-at-a-time ``udf()`` here would do
    |dim| Python float ops per ROW with interpreter overhead per element.
    """
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.linalg.norm(q)) or 1.0

    def _score(vecs):
        m, mask = _stack_nullable(vecs, len(q))
        dots = m @ q
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        out = pd.array(dots / (norms * qn), dtype="Float64")
        out[mask] = pd.NA  # null embedding → null score, not a crash
        return pd.Series(out)

    # no type hints: this module uses `from __future__ import annotations`,
    # which stringifies hints before pandas_udf can inspect them
    score = pandas_udf(_score, "double")
    return df.select(id_col, score(F.col(vec_col)).alias(out))


def lsh_cosine_near_pairs(
    df: DataFrame,
    threshold: float,
    num_planes: int = 8,
    num_tables: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    dim: int | None = None,
    max_bucket_size: int | None = None,
    materialize: bool = False,
    verify_impl: str = "kernel",
) -> DataFrame:
    """Embedding near-duplicate PAIRS via LSH bucketing — the scale path
    next to the exact O(n²) ``cosine_pairs`` baseline (same output
    contract: (id_a, id_b, cos_sim) with cos_sim ≥ threshold, id_a < id_b).

    Candidates are pairs sharing a full signature bucket in ANY of
    ``num_tables`` independent tables (OR amplification); only candidates
    get the exact cosine verification. Recall for a pair at cosine θ is
    1 − (1 − p^planes)^tables with p = 1 − arccos(θ)/π — tune
    (planes, tables) to the corpus like MinHash-LSH's (bands, rows).

    Scale: ALL table signatures are computed in one pass over the data —
    an Arrow-batched numpy matmul (``_lsh_signatures_pandas``; the JVM
    fold form is tables × planes interpreted lambda dot-products per row
    and dominated the runtime) — then posexploded to (table, signature)
    rows and equi-joined on that composite key: ONE shuffle of
    O(n × tables) rows, the exact shape of ``dedup.lsh_candidate_pairs``
    banding (measured 4.5× total vs the per-table-join-then-union JVM
    form at 16 tables × 64 dims). Hot buckets
    (near-constant vectors) are the skew risk: ``max_bucket_size`` drops
    buckets above the cap, same mitigation and same caveat as
    ``lsh_candidate_pairs``. The verify join touches candidate ids only —
    embeddings shuffle once per side, not per pair.
    """
    if num_tables < 1:
        raise ValueError(f"num_tables must be >= 1, got {num_tables}")
    if dim is None:
        probe = df.filter(F.col(vec_col).isNotNull()).select(F.size(vec_col).alias("n")).first()
        if probe is None or probe.n < 0:
            raise ValueError("cannot infer embedding dim from an empty/null column")
        dim = probe.n
    vec = F.col(vec_col).cast("array<double>")
    planes_t = [
        _hyperplanes(num_planes, dim, seed + 1000003 * t) for t in range(num_tables)
    ]
    sig_arr = _lsh_signatures_pandas(planes_t)(vec)
    # posexplode_outer, not posexplode: the non-outer form makes the
    # optimizer infer a size()>0 filter whose pushdown re-inlines the
    # whole signature array below the Generate (the same
    # InferFiltersFromGenerate trap documented in
    # dedup.fingerprint_collision_pairs); the array here is never empty.
    tabled = df.select(
        F.col(id_col), F.posexplode_outer(sig_arr).alias("__table", "__sig")
    )
    # localCheckpoint (opt-in — default keeps the operator lazy; the
    # registered query passes True): the self-join (and the optional
    # bucket-size aggregate) reference this subtree 2–3×, each re-running
    # the Arrow signature pass — materialize the narrow (id, table, sig)
    # rows once (same discipline as dedup.fingerprint_collision_pairs).
    if materialize:
        tabled = tabled.localCheckpoint(eager=True)
    if max_bucket_size is not None:
        sizes = (
            tabled.groupBy("__table", "__sig")
            .agg(F.count(F.lit(1)).alias("__bsz"))
            .filter(F.col("__bsz") <= max_bucket_size)
        )
        tabled = tabled.join(sizes.select("__table", "__sig"), ["__table", "__sig"])
    a, b = tabled.alias("a"), tabled.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.__table") == F.col("b.__table"))
            & (F.col("a.__sig") == F.col("b.__sig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
    )
    # Verify parallelism (round 16, re-shaped round 17): the candidate
    # stream is bytes-tiny (two ids per row) but the verify costs real
    # per-row work, so AQE's byte-based post-shuffle coalescing starved
    # the verify stage (the 1 MB minPartitionSize floor left 8
    # partitions carrying 22 s of executor CPU at sf0.1 — stage-level
    # REST metrics). An explicit NUMBERED repartition is exempt from AQE
    # coalescing; the width follows defaultParallelism (cores locally,
    # executors × cores on a cluster), not a local constant, and the
    # exchange carries only the id pairs. Round 17 moved it BELOW the
    # dedup: hash-partitioning on id_a clusters every duplicate
    # (id_a, id_b) row into one partition (a subset of the distinct
    # keys satisfies ClusteredDistribution), so the distinct reuses this
    # exchange instead of adding its own — one 32-wide exchange where
    # r16 had the distinct's AQE-coalesced exchange PLUS this one
    # (plan: q_lsh_cosine_near_pairs_after shows a single
    # REPARTITION_BY_NUM under the aggregate).
    cand = cand.repartition(
        df.sparkSession.sparkContext.defaultParallelism, F.col("id_a")
    ).distinct()
    # Verify (round 17): two impls, value-identical.
    #
    # - "kernel" (default): the r16 naive Arrow swap measured 1.5× SLOWER
    #   because each candidate pair carried 2×dim doubles through the
    #   boundary. The fix (guide §8: "shuffle keys and metadata instead
    #   of payloads") is to move the vectors ONCE — the (id → vector)
    #   matrix rides a Spark broadcast into the Python workers — and
    #   ship only the two ids per pair through Arrow. The dot/norm folds
    #   replay the JVM fold's IEEE add order exactly (sequential over
    #   dim, vectorized across pairs — the q_pq_codes kernel recipe), so
    #   the pre-round double is bit-identical to cosine() (parity pinned
    #   by test_lsh_verify_kernel_matches_jvm). Memory bound: the
    #   broadcast holds n×dim float64 (~0.5 GB per 1M vectors at
    #   dim=64) — fine for any corpus whose embeddings fit one machine;
    #   beyond that pass verify_impl="jvm" (SCALING.md row).
    # - "jvm": pure-JVM joins, no broadcast bound. Round 17 moved the
    #   norm folds out of the per-pair cosine: norms are per-VECTOR
    #   functions, so they are computed once per id on the (n)-row side
    #   of the verify join instead of twice per candidate pair — the
    #   per-pair work drops from 3 interpreted dim-folds to 1 (the dot).
    #   Same arithmetic on the same doubles → identical results.
    if verify_impl == "kernel":
        scored = _lsh_verify_broadcast(cand, df, id_col, vec)
    else:
        v = df.select(
            F.col(id_col), vec.alias("__v"), norm(vec).alias("__n")
        )
        scored = (
            cand.join(
                v.withColumnsRenamed({id_col: "id_a", "__v": "__va", "__n": "__na"}),
                "id_a",
            )
            .join(
                v.withColumnsRenamed({id_col: "id_b", "__v": "__vb", "__n": "__nb"}),
                "id_b",
            )
            .withColumn(
                "__cos",
                dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb")),
            )
        )
    return (
        scored.withColumn("cos_sim", F.round(F.col("__cos"), 4))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def _lsh_verify_broadcast(
    cand: DataFrame, df: DataFrame, id_col: str, vec: Column
) -> DataFrame:
    """Exact-cosine verify over candidate id pairs with the embedding
    matrix broadcast to the Python workers: only (id_a, id_b) crosses the
    Arrow boundary per pair (the §8 'move heavy bytes once' shape — the
    per-pair join form ships 2×dim doubles per candidate).

    Bit-exactness: dot and norm replay ``dot()``/``norm()``'s sequential
    left-fold add order — a Python loop over dim positions, each step an
    elementwise IEEE-double op vectorized across the pair batch — and the
    final ``dot / (norm_a * norm_b)`` matches ``cosine()``'s expression
    tree. Norms are computed once per vector at broadcast-build time
    (a per-vector pure function — same doubles as the per-pair fold).
    NULL vectors and vectors with NULL elements score NULL against
    everything, exactly like the JVM fold (a NULL product poisons the
    whole fold)."""
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

    rows = df.select(F.col(id_col).alias("i"), vec.alias("v")).collect()
    n = len(rows)
    dim = next((len(r.v) for r in rows if r.v is not None), 0)
    mat = np.zeros((max(n, 1), max(dim, 1)), dtype=np.float64)
    bad = np.zeros(max(n, 1), dtype=bool)
    ids = []
    for i, r in enumerate(rows):
        ids.append(r.i)
        v = r.v
        if v is None or len(v) != dim or any(x is None for x in v):
            bad[i] = True
        else:
            mat[i, :] = v
    # id → row lookup: sorted-ids + searchsorted for integer ids (fully
    # vectorized — a per-element dict .map() measured as the stage's
    # blocking cost at 1.3M candidate pairs), dict fallback otherwise
    int_ids = all(isinstance(x, int) for x in ids)
    if int_ids and n:
        ids_arr = np.asarray(ids, dtype=np.int64)
        order = np.argsort(ids_arr, kind="stable")
        sorted_ids, perm = ids_arr[order], order
    else:
        sorted_ids, perm = None, None
    id2row = {x: i for i, x in enumerate(ids)}
    # norms once per vector, sequential fold in dim order (= norm())
    acc = np.zeros(mat.shape[0], dtype=np.float64)
    for j in range(dim):
        acc = acc + mat[:, j] * mat[:, j]
    norms = np.sqrt(acc)
    bc = df.sparkSession.sparkContext.broadcast(
        (id2row, sorted_ids, perm, mat, norms, bad, dim)
    )

    def _lookup(col, sorted_ids_, perm_, id2row_):
        if sorted_ids_ is not None:
            return perm_[
                np.searchsorted(sorted_ids_, col.to_numpy(dtype=np.int64))
            ]
        return col.map(id2row_).to_numpy(dtype=np.int64)

    def _cos(ia, ib):
        # Broadcast.value caches after the first deref in each worker, so
        # the matrix unpickles once per executor process, not per batch
        id2row_, sorted_ids_, perm_, mat_, norms_, bad_, dim_ = bc.value
        ra = _lookup(ia, sorted_ids_, perm_, id2row_)
        rb = _lookup(ib, sorted_ids_, perm_, id2row_)
        a, b = mat_[ra], mat_[rb]
        d = np.zeros(len(ra), dtype=np.float64)
        for j in range(dim_):
            d = d + a[:, j] * b[:, j]
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = d / (norms_[ra] * norms_[rb])
        out = pd.array(cos, dtype="Float64")
        out[bad_[ra] | bad_[rb]] = pd.NA
        return pd.Series(out)

    # asNondeterministic stops the threshold filter's pushdown from
    # duplicating the ArrowEvalPython node (guide §4.4, the PQ precedent)
    score = pandas_udf(_cos, "double").asNondeterministic()
    return cand.withColumn("__cos", score(F.col("id_a"), F.col("id_b")))


def _lsh_signatures_pandas(planes_t: list[list[list[float]]]):
    """Arrow-batched pandas UDF computing ALL tables' sign-bit signatures
    in one numpy matmul per batch: (batch × dim) @ (dim × tables·planes)
    → sign bits → packed per-table longs, returned as array<long>.

    This is the §2.9 escape hatch used deliberately: a JVM
    ``lsh_signature`` column is tables × planes separate higher-order
    fold dot-products per row, and higher-order functions don't
    whole-stage-codegen — at 16 tables × 4 planes × 64 dims that is
    ~4096 interpreted lambda steps per row, which dominated
    q_lsh_cosine_near_pairs' runtime. One BLAS call per Arrow batch
    replaces all of it. Both paths are float64 dot products and agree on
    the fixture (parity pinned by tests/test_text_dedup_similarity.py::
    test_lsh_signature_pandas_matches_jvm), but BLAS pairwise summation
    vs a sequential fold CAN round differently and flip a sign bit when
    a dot product lands within float ulps of zero — for a vector exactly
    on a hyperplane the bucket choice is arbitrary either way. If oracle
    flakiness ever appears on borderline vectors, exclude pairs whose
    winning dot is within an epsilon of zero.
    """
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

    n_tables = len(planes_t)
    n_planes = len(planes_t[0])
    w = np.array(
        [p for planes in planes_t for p in planes], dtype=np.float64
    ).T  # dim × (tables·planes)
    pack = 1 << np.arange(n_planes, dtype=np.int64)

    def _sig(vecs):
        m, mask = _stack_nullable(vecs, w.shape[0])
        bits = (m @ w) >= 0  # batch × (tables·planes)
        sigs = np.stack(
            [bits[:, t * n_planes : (t + 1) * n_planes] @ pack for t in range(n_tables)],
            axis=1,
        )  # batch × tables
        # null embedding → null signature array; downstream equi-joins on
        # (table, sig) drop those rows, matching the old JVM-fold behavior
        return pd.Series([None if mask[i] else sigs[i] for i in range(len(sigs))])

    # no type hints: `from __future__ import annotations` stringifies them
    # before pandas_udf can inspect them (module convention)
    return pandas_udf(_sig, "array<long>")


def _hyperplanes(num_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (LCG-based — no RNG
    state, reproducible across runs/engines)."""
    planes = []
    state = seed
    for _ in range(num_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            # map to (-1, 1)
            row.append(((state >> 11) / float(1 << 53)) * 2.0 - 1.0)
        n = math.sqrt(sum(x * x for x in row)) or 1.0
        planes.append([x / n for x in row])
    return planes


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature: bit p set iff dot(vec, plane_p) ≥ 0."""
    sig = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        pl = F.array(*[F.lit(float(x)) for x in plane])
        sig = sig + F.when(dot(vec, pl) >= 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sig


def ivf_fit_centroids(
    df: DataFrame,
    k_cells: int = 16,
    vec_col: str = "embedding",
    iters: int = 5,
    id_col: str = "vec_id",
    dim: int | None = None,
    update: str = "agg",
    metric: str = "cosine",
) -> list[list[float]]:
    """Deterministic k-means coarse quantizer for an IVF index (the
    k-means-partitioned ANN family next to SRP-LSH). ``metric`` picks
    the geometry: ``"cosine"`` (default, the original spherical form —
    vectors and centroids L2-normalized, max-dot ≡ nearest) or
    ``"l2"`` (plain Euclidean Lloyd, un-normalized centroids — the
    FAISS-default coarse tier, and the REQUIRED one under residual
    IVF-PQ: residuals against unit-normalized centroids barely shrink
    the span, measured in the round-12 residual A/B).

    Deterministic by construction: centroids initialize from the
    ``k_cells`` smallest-id vectors (data-derived, no RNG) and Lloyd
    iterations are fixed-count — the same corpus always yields the same
    index, which is what makes IVF queries testable.

    Scale: each iteration is ONE narrow Arrow-batched assignment pass
    (batch matmul, argmax) + ONE partial-aggregated shuffle of k_cells ×
    dim running sums (the per-dimension avg aggregate); only the k×dim
    centroid matrix ever reaches the driver. Production practice at
    100 TB is to FIT on a sample (df.sample) and assign the full corpus
    once — the fit cost is bounded by the sample, the assignment pass by
    one scan.

    ``update`` picks the mean-update plan: ``"agg"`` (default) is the
    per-dimension ``F.avg`` aggregate above — dim aggregate
    EXPRESSIONS, which stops scaling as dim grows (measured: OOMs the
    1 GiB local JVM at dim=1024/n=20k — SCALING.md "Round 12");
    ``"arrow"`` folds per-cell running sums in two Arrow passes
    (``_mean_update_arrow``, same scheme as
    ``kmeans(assignment="arrow")``) — the wide-dim production path,
    trading last-ulp summation order exactly as the assignment kernel
    already does.
    """
    if k_cells < 1 or iters < 1:
        raise ValueError(f"k_cells and iters must be >= 1, got {k_cells}, {iters}")
    if update not in ("agg", "arrow"):
        raise ValueError(f"update must be 'agg' or 'arrow', got {update!r}")
    if metric not in ("cosine", "l2"):
        raise ValueError(f"metric must be 'cosine' or 'l2', got {metric!r}")
    import numpy as np  # noqa: PLC0415

    vec = F.col(vec_col).cast("array<double>")
    seeds = (
        df.filter(vec.isNotNull())
        .orderBy(id_col)
        .limit(k_cells)
        .select(vec.alias("v"))
        .collect()
    )
    if not seeds:
        raise ValueError("cannot infer embedding dim from an empty/null column")
    if len(seeds) < k_cells:
        raise ValueError(f"need >= {k_cells} vectors to fit {k_cells} cells")
    if dim is None:
        # infer from the seeds collect instead of a separate .first()
        # probe — one fewer fixed-latency Spark job per fit (round 13)
        dim = len(seeds[0].v)

    def _norm_rows(m):
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return m / n

    centroids = np.array([r.v for r in seeds], dtype=np.float64)
    if metric == "cosine":
        centroids = _norm_rows(centroids)
    for _ in range(iters):
        cell = _cell_assigner(df.sparkSession, centroids.tolist(), metric)(vec)
        # null vectors take no part in the fit (their cell is null);
        # dropping them here keeps the centroid update well-defined
        members = df.filter(vec.isNotNull()).select(
            cell.alias("__c"), vec.alias("__v")
        )
        new_c = centroids.copy()  # empty cells keep their old centroid
        if update == "arrow":
            for c, (n, s) in _mean_update_arrow(members, dim).items():
                new_c[c] = s / n
        else:
            sums = members.groupBy("__c").agg(
                *[F.avg(F.col("__v")[i]).alias(f"c{i}") for i in range(dim)]
            ).collect()
            for r in sums:
                new_c[r["__c"]] = [r[f"c{i}"] for i in range(dim)]
        centroids = np.asarray(new_c, dtype=np.float64)
        if metric == "cosine":
            centroids = _norm_rows(centroids)
    return centroids.tolist()


def _cell_assigner(spark: SparkSession, centroids: list[list[float]], metric: str):
    """Metric-dispatched Arrow cell assignment: max-dot for the
    spherical tier (`_ivf_assign_pandas`), L2 argmin for the Euclidean
    tier (the `_arrow_assign_udf` kernel — |v|² drops out of the
    argmin). Both NULL-safe, ties to the lower cell id."""
    if metric == "l2":
        return _arrow_assign_udf(spark, centroids, "closure")
    return _ivf_assign_pandas(centroids)


def _ivf_assign_pandas(centroids: list[list[float]]):
    """Arrow-batched cell assignment: argmax dot product against the
    (normalized) centroid matrix — one numpy matmul per batch, same
    rationale as ``_lsh_signatures_pandas`` (k dot products per row as
    JVM folds would be interpreted, not codegen)."""
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

    c = np.asarray(centroids, dtype=np.float64).T  # dim × k

    def _assign(vecs):
        m, mask = _stack_nullable(vecs, c.shape[0])
        cells = pd.array((m @ c).argmax(axis=1).astype(np.int32), dtype="Int32")
        cells[mask] = pd.NA  # null embedding → null cell (no crash)
        return pd.Series(cells)

    return pandas_udf(_assign, "int")


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    out: str = "ivf_cell",
    metric: str = "cosine",
) -> DataFrame:
    """Attach each vector's IVF cell id — the persistable narrow column a
    100 TB embedding store would ``partitionBy`` (or bucket by), so a
    probe becomes partition PRUNING instead of a scan. ``metric`` must
    match the fit (`ivf_fit_centroids`)."""
    return df.withColumn(
        out,
        _cell_assigner(df.sparkSession, centroids, metric)(
            F.col(vec_col).cast("array<double>")
        ),
    )


def ivf_assign_fold(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    out: str = "ivf_cell",
    impl: str = "seq",
) -> DataFrame:
    """``ivf_assign``'s ORACLE-REPLAYABLE twin (L2 metric only): the
    cell id as a pure JVM expression — one ``transform`` over the
    literal centroid array computing each squared-L2 distance as the
    sequential left-to-right fold DuckDB's ``list_sum`` replays
    term-for-term, ties to the LOWER cell via first-index-of-min
    (the ``_pq_argmin`` spelling at full dim).

    Why it exists: ``ivf_fit_centroids``/``ivf_assign`` run the
    assignment through the Arrow matmul kernel — the right production
    plan, but its BLAS summation order is not value-replayable
    cross-engine, which is why the IVF family's driver oracles were
    recall BOOLEANS (q_ivf_recall) rather than value checks. With
    FIXED centroids (seeds, or a frozen fit artifact) this fold makes
    the whole composed IVF-PQ query value-checkable — the batch-20
    q_ivfpq_topk oracle replays cell assignment, probe selection, and
    the ADC scan end to end.

    Scale: k_cells × dim literal tree evaluated interpreted per row —
    fine for oracle geometries (k_cells in the tens); a production
    store assigns with the Arrow kernel and PERSISTS the column, so
    this fold is never in a hot path. NULL vectors get NULL cells.

    ``impl`` (round 16): ``"jvm"`` is the original literal-tree fold;
    ``"seq"`` routes through ``_seq_l2_assign_udf`` — bit-identical
    values (explicit sequential IEEE accumulation, first-min argmin)
    without the k_cells × dim literal tree's plan-construction /
    analysis / interpretation cost (parity pinned by
    ``test_ivf_assign_fold_matches_python_replay_random``).
    """
    if impl not in ("jvm", "seq"):
        raise ValueError(f"impl must be 'jvm' or 'seq', got {impl!r}")
    vec = F.col(vec_col).cast("array<double>")
    if impl == "seq":
        return df.withColumn(out, _seq_l2_assign_udf(centroids)(vec))
    cents = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in centroids])
    dists = F.transform(
        cents,
        lambda c: F.aggregate(
            F.zip_with(vec, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, d: acc + d,
        ),
    )
    cell = (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    return df.withColumn(out, F.when(vec.isNotNull(), cell))


def _probe_cells(
    centroids: list[list[float]], query_vec: list[float], nprobe: int, metric: str
) -> list[int]:
    """Driver-side probe-cell selection (k×dim metadata, no data
    touched): nearest-by-metric, stable order.

    Distances are SEQUENTIAL left-to-right folds in IEEE double — the
    ``ivf_assign_fold`` order DuckDB's ``list_sum`` replays — not
    numpy's pairwise summation (ADVICE r13: near-tied centroid
    distances could rank probes differently cross-engine and flake the
    batch-20 value oracle, whose docstring promises "same fold order").
    The matrix is k_cells×dim driver metadata, so the Python loop costs
    microseconds and buys bit-exact oracle replay."""
    dists = []
    for cw in centroids:
        d = 0.0
        if metric == "l2":
            for x, y in zip(query_vec, cw):
                t = float(x) - float(y)
                d += t * t
        else:
            for x, y in zip(query_vec, cw):
                d -= float(x) * float(y)  # negated dot → ascending sort
        dists.append(d)
    order = sorted(range(len(dists)), key=lambda i: (dists[i], i))
    return order[: max(1, nprobe)]


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str | None = None,
    exclude_ids: tuple[int, ...] = (),
    metric: str = "cosine",
) -> DataFrame:
    """IVF approximate top-k: score only vectors whose cell is among the
    ``nprobe`` centroids nearest the query (computed driver-side from the
    k×dim centroid matrix — no data touched). With a precomputed
    ``cell_col`` the filter is a narrow column predicate (partition
    pruning when the store is partitioned by cell); otherwise cells are
    assigned on the fly (one Arrow pass).

    Recall/latency trades via nprobe/k_cells exactly like LSH's
    tables/planes; measured against the exact baseline by
    ``q_ivf_recall`` and tests. Final scoring follows ``metric``:
    cosine (descending similarity) for the spherical tier, squared L2
    (ascending, ``l2_topk``) for the Euclidean one — a mixed pair
    would rank candidates by a different geometry than the one that
    probed them.
    """
    probe_cells = _probe_cells(centroids, query_vec, nprobe, metric)
    if cell_col is None:
        df = ivf_assign(df, centroids, vec_col, "__ivf_cell", metric)
        cell_col = "__ivf_cell"
    probed = df.filter(F.col(cell_col).isin(probe_cells)).drop("__ivf_cell")
    if metric == "l2":
        return l2_topk(probed, query_vec, k, id_col, vec_col, exclude_ids)
    return cosine_topk(probed, query_vec, k, id_col, vec_col, exclude_ids)


def ivf_topk_multi(
    df: DataFrame,
    queries: dict[int, list[float]],
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str | None = None,
    exclude_query_ids: bool = True,
    metric: str = "cosine",
    round_dp: int = 6,
    mode: str = "fold",
) -> DataFrame:
    """Batched ``ivf_topk`` — the raw-vector IVF tier's serving form
    (round 14 completes the batched family: every ANN tier now has a
    multi-query path). Per-query probe cells are selected driver-side;
    the store is scanned ONCE over the UNION of all probed cells
    (directory pruning when ``cell_col`` is the partition column); each
    query scores only ITS OWN probed rows. Output (query_id, id_col,
    l2|cos_sim), per-query rows identical to ``ivf_topk``
    (parity-tested).

    ``mode``: ``"fold"`` = per-query exact-scoring branches over the
    shared pruned scan (oracle-grade sequential folds); ``"arrow"`` =
    ONE mapInPandas pass — the kernel stacks each Arrow batch once,
    computes all Q score columns by matmul, masks each query to its
    probed cells, and emits local top-k per (task, query), so the
    global re-rank shuffles ≤ partitions × Q × k rows.
    """
    if not queries:
        raise ValueError("need at least one query")
    if mode not in ("fold", "arrow"):
        raise ValueError(f"mode must be 'fold' or 'arrow', got {mode!r}")
    id_t = _validated_id_type(df, id_col)
    probes = {
        qid: _probe_cells(centroids, q, nprobe, metric)
        for qid, q in queries.items()
    }
    work = df
    if cell_col is None:
        work = ivf_assign(work, centroids, vec_col, "__ivf_cell", metric)
        cell_col = "__ivf_cell"
    union_cells = sorted({c for p in probes.values() for c in p})
    scoped = work.filter(F.col(cell_col).isin(union_cells))
    qids = sorted(queries)
    score_col = "l2" if metric == "l2" else "cos_sim"
    if mode == "fold":
        out = None
        for qid in qids:
            probed = scoped.filter(F.col(cell_col).isin(probes[qid]))
            excl = (qid,) if exclude_query_ids else ()
            if metric == "l2":
                branch = l2_topk(
                    probed, queries[qid], k, id_col, vec_col, excl, round_dp
                )
            else:
                branch = cosine_topk(
                    probed.filter(F.col(vec_col).isNotNull()),
                    queries[qid], k, id_col, vec_col, excl,
                )
            out_branch = branch.select(
                F.lit(int(qid)).cast("int").alias("query_id"),
                F.col(id_col),
                F.col(score_col),
            )
            out = out_branch if out is None else out.unionByName(out_branch)
        return out

    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    dim = len(queries[qids[0]])
    qm = np.asarray([queries[qid] for qid in qids], dtype=np.float64)
    qid_arr = np.asarray(qids, dtype=np.int64)
    q_sq = (qm * qm).sum(axis=1)
    q_norm = np.sqrt(q_sq)
    probe_sets = [frozenset(probes[qid]) for qid in qids]
    dp = round_dp if metric == "l2" else 4
    asc = metric == "l2"

    def gen(batches):
        for pdf in batches:
            x, null_mask = _stack_nullable(pdf[vec_col].to_numpy(), dim)
            keep0 = ~null_mask & pdf[cell_col].notna().to_numpy()
            if metric == "cosine":
                # zero-norm exclusion — the cosine_topk candidate rule
                # (ADVICE r14: numpy ranks the NaN last, Spark first)
                keep0 &= (x * x).sum(axis=1) > 0
            if not keep0.any():
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)[keep0]
            cells = pdf[cell_col].to_numpy()[keep0].astype(np.int64)
            x = x[keep0]
            if metric == "l2":
                scores = (
                    (x * x).sum(axis=1)[:, None] - 2.0 * (x @ qm.T)
                    + q_sq[None, :]
                )
            else:
                scores = (x @ qm.T) / (
                    np.sqrt((x * x).sum(axis=1))[:, None] * q_norm[None, :]
                )
            r = _round_half_up_np(scores, dp)
            parts = []
            for qi, qid in enumerate(qid_arr):
                keep = np.isin(cells, list(probe_sets[qi]))
                if exclude_query_ids:
                    keep &= ids != qid
                if not keep.any():
                    continue
                col = r[keep, qi]
                order = np.lexsort((ids[keep], col if asc else -col))[:k]
                parts.append(
                    pd.DataFrame(
                        {
                            "query_id": np.full(
                                int(order.size), qid, dtype=np.int32
                            ),
                            id_col: ids[keep][order],
                            score_col: col[order],
                        }
                    )
                )
            if parts:
                yield pd.concat(parts, ignore_index=True)

    local = scoped.select(id_col, vec_col, cell_col).mapInPandas(
        gen, schema=f"query_id int, {id_col} {id_t}, {score_col} double"
    )
    order_col = F.col(score_col).asc() if asc else F.col(score_col).desc()
    w = Window.partitionBy("query_id").orderBy(order_col, F.col(id_col))
    return (
        local.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def ann_lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    num_tables: int = 1,
    radius: int = 1,
    exclude_ids: tuple[int, ...] = (),
    sig_cols: list[str] | None = None,
) -> DataFrame:
    """Approximate top-k: score only vectors whose LSH bucket is within
    Hamming distance ≤ ``radius`` of the query's bucket in ANY of
    ``num_tables`` independent hash tables (standard SRP-LSH OR-of-ANDs
    amplification, Charikar 2002 / Indyk–Motwani 1998).

    Recall math (public SRP result): a neighbor at cosine θ matches one
    plane with p = 1 − θ/π; a table probes it with
    P₁ = Σ_{i≤radius} C(planes,i) (1−p)^i p^(planes−i); L tables give
    recall ≈ 1 − (1 − P₁)^L. Tune (planes, radius, tables) per corpus —
    high-sim corpora need 1 table; near-uniform fixtures need several.

    At scale: the L signatures are narrow persistable columns you'd
    bucket-by; a query touches only the union of probed buckets —
    ~L·Σ_{i≤r} C(planes,i)/2^planes of the data instead of all of it.
    Exactness is traded for that pruning — measure recall against
    ``cosine_topk`` (tests and q_ann_recall do).

    ``sig_cols`` (round 14) names PERSISTED signature columns — the
    production form the bench measured: re-hashing the corpus per query
    was the dominant sequential cost (SCALING round-14 addendum), so a
    real store writes the L signature columns once (``lsh_signature``
    with the SAME (num_planes, dim, seed) table derivation — the caller
    owns that contract) and queries skip the hashing pass entirely;
    ``num_tables`` is then ``len(sig_cols)``. Write the store with
    ``lsh_persist_signatures`` — it owns the canonical derivation and
    this entry point validates the handoff (columns exist + integral).
    """
    if sig_cols is not None:
        _validate_sig_cols(df, sig_cols)
        num_tables = len(sig_cols)
    if num_tables < 1:
        raise ValueError(f"num_tables must be >= 1, got {num_tables}")
    dim = len(query_vec)
    vec = F.col(vec_col).cast("array<double>")
    probe_any = F.lit(False)
    sigs = df
    persisted = sig_cols is not None
    if not persisted:
        # collision-safe temp-column prefix: user frames may legitimately
        # carry columns named lsh_sig_* (e.g. persisted signatures)
        sig_cols = [f"__ann_lsh_sig_{t}" for t in range(num_tables)]
    for t, col in enumerate(sig_cols):
        planes = _hyperplanes(num_planes, dim, seed + 1000003 * t)
        qsig = _lsh_query_sig(query_vec, planes)
        if not persisted:
            sigs = sigs.withColumn(col, lsh_signature(vec, planes))
        probe_any = probe_any | (
            F.bit_count(F.col(col).bitwiseXOR(F.lit(qsig))) <= radius
        )
    probe = sigs.filter(probe_any)
    if not persisted:
        probe = probe.drop(*sig_cols)
    return cosine_topk(probe, query_vec, k, id_col, vec_col, exclude_ids)


def lsh_persist_signatures(
    df: DataFrame,
    num_planes: int = 8,
    num_tables: int = 1,
    seed: int = 42,
    vec_col: str = "embedding",
    prefix: str = "lsh_sig",
    dim: int | None = None,
) -> tuple[DataFrame, list[str]]:
    """Attach the CANONICAL persisted SRP signature columns — the
    helper that owns the ``sig_cols`` contract (ADVICE r14: the
    derivation ``_hyperplanes(num_planes, dim, seed + 1000003·t)`` in
    sig_cols order was private, so a store written under any other
    seed or table order silently probed wrong buckets). Write a store
    with THIS, then serve with ``ann_lsh_topk(..., sig_cols=cols)`` /
    ``ann_lsh_topk_multi(..., sig_cols=cols)`` under the SAME
    (num_planes, seed) — the query-side signatures are derived
    identically per table index, so matching is guaranteed by
    construction instead of by convention.

    Returns ``(frame_with_columns, column_names)``; column t is
    ``{prefix}_{t}``. ``dim`` defaults to the first non-null vector's
    length (one metadata-sized probe job — pass it explicitly in
    pipelines that know their width).

    Scale: this is the ONE hashing pass over the corpus (the dominant
    sequential-serving cost the round-14 bench measured — 119× when
    amortized away); persist/bucket the output by a signature column
    and every future probe is narrow-column pruning."""
    if num_tables < 1:
        raise ValueError(f"num_tables must be >= 1, got {num_tables}")
    if dim is None:
        row = (
            df.filter(F.col(vec_col).isNotNull())
            .select(F.size(F.col(vec_col)))
            .first()
        )
        if row is None:
            raise ValueError(f"no non-null {vec_col} rows to derive dim from")
        dim = int(row[0])
    vec = F.col(vec_col).cast("array<double>")
    cols = [f"{prefix}_{t}" for t in range(num_tables)]
    out = df
    for t, col in enumerate(cols):
        planes = _hyperplanes(num_planes, dim, seed + 1000003 * t)
        out = out.withColumn(col, lsh_signature(vec, planes))
    return out, cols


def _validate_sig_cols(df: DataFrame, sig_cols: list[str]) -> None:
    """Fail fast on a malformed persisted-signature handoff (ADVICE
    r14): missing columns meant a typo'd store, non-integral columns
    mean it was not written by ``lsh_signature`` — either way recall
    would silently collapse to near-zero with no error."""
    if not sig_cols:
        raise ValueError("sig_cols must name at least one column")
    missing = [c for c in sig_cols if c not in df.columns]
    if missing:
        raise ValueError(
            f"sig_cols not in frame: {missing} (have {df.columns}) — "
            "write the store with lsh_persist_signatures"
        )
    bad = [
        (c, df.schema[c].dataType.simpleString())
        for c in sig_cols
        if df.schema[c].dataType.simpleString() not in _INTEGRAL_TYPES
    ]
    if bad:
        raise ValueError(
            f"sig_cols must be integral signature columns, got {bad} — "
            "write the store with lsh_persist_signatures"
        )


def _lsh_query_sig(query_vec: list[float], planes: list[list[float]]) -> int:
    """The query's SRP signature under one table's hyperplanes —
    driver-side ints, the same sign rule ``lsh_signature`` compiles."""
    qsig = 0
    for p, plane in enumerate(planes):
        if sum(q * x for q, x in zip(query_vec, plane)) >= 0:
            qsig |= 1 << p
    return qsig


def _hamming_ball(sig: int, num_planes: int, radius: int) -> list[int]:
    """Every signature within Hamming distance ≤ radius of ``sig`` —
    Σ_{i≤r} C(planes, i) driver-side ints (9 at planes=8/radius=1),
    so a probe set is an ``isin`` literal list, never a scan-side
    popcount."""
    from itertools import combinations  # noqa: PLC0415

    ball = [sig]
    for r in range(1, radius + 1):
        for bits in combinations(range(num_planes), r):
            m = 0
            for b in bits:
                m |= 1 << b
            ball.append(sig ^ m)
    return ball


def ann_lsh_topk_multi(
    df: DataFrame,
    queries: dict[int, list[float]],
    k: int = 10,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    num_tables: int = 1,
    radius: int = 1,
    exclude_query_ids: bool = True,
    mode: str = "fold",
    sig_cols: list[str] | None = None,
) -> DataFrame:
    """Batched ``ann_lsh_topk`` — the SRP-LSH tier's serving form. The
    L signature columns are computed ONCE for the whole frame (the
    expensive pass at 100 TB — or already persisted as bucket columns),
    the scan is filtered to the UNION of every query's probed buckets,
    and each query scores only ITS OWN Hamming-ball rows. Output
    (query_id, id_col, cos_sim), per-query rows identical to
    ``ann_lsh_topk`` (parity-tested).

    ``mode``: ``"fold"`` = per-query cosine branches over the shared
    bucket-pruned scan; ``"arrow"`` = ONE mapInPandas pass — per Arrow
    batch one matmul scores all Q columns and each query's mask is an
    ``isin`` against its driver-enumerated Hamming ball
    (Σ_{i≤r} C(planes, i) ints per table — probe-set literals, never a
    scan-side popcount), local top-k per (task, query).

    ``sig_cols`` names PERSISTED signature columns (the ``ann_lsh_topk``
    contract: written by ``lsh_signature`` under the same
    (num_planes, dim, seed) derivation) — the whole batch then skips
    the hashing pass, the dominant cost the round-14 bench measured.
    """
    if not queries:
        raise ValueError("need at least one query")
    if mode not in ("fold", "arrow"):
        raise ValueError(f"mode must be 'fold' or 'arrow', got {mode!r}")
    if sig_cols is not None:
        _validate_sig_cols(df, sig_cols)
        num_tables = len(sig_cols)
    if num_tables < 1:
        raise ValueError(f"num_tables must be >= 1, got {num_tables}")
    id_t = _validated_id_type(df, id_col)
    qids = sorted(queries)
    dim = len(queries[qids[0]])
    vec = F.col(vec_col).cast("array<double>")
    persisted = sig_cols is not None
    if not persisted:
        sig_cols = [f"__ann_lsh_sig_{t}" for t in range(num_tables)]
    tables = []  # (col, planes)
    sigs = df
    for t, col in enumerate(sig_cols):
        planes = _hyperplanes(num_planes, dim, seed + 1000003 * t)
        if not persisted:
            sigs = sigs.withColumn(col, lsh_signature(vec, planes))
        tables.append((col, planes))
    # per (query, table): the query's signature and its probe ball
    balls = {
        qid: [
            _hamming_ball(
                _lsh_query_sig(queries[qid], planes), num_planes, radius
            )
            for _, planes in tables
        ]
        for qid in qids
    }
    union_probe = F.lit(False)
    for ti, (col, _) in enumerate(tables):
        union_ball = sorted({b for qid in qids for b in balls[qid][ti]})
        union_probe = union_probe | F.col(col).isin(union_ball)
    scoped = sigs.filter(union_probe)
    if mode == "fold":
        out = None
        for qid in qids:
            probe_any = F.lit(False)
            for ti, (col, _) in enumerate(tables):
                probe_any = probe_any | F.col(col).isin(balls[qid][ti])
            excl = (qid,) if exclude_query_ids else ()
            probed = scoped.filter(probe_any & vec.isNotNull())
            if not persisted:
                probed = probed.drop(*sig_cols)
            branch = cosine_topk(
                probed,
                queries[qid], k, id_col, vec_col, excl,
            ).select(
                F.lit(int(qid)).cast("int").alias("query_id"),
                F.col(id_col),
                F.col("cos_sim"),
            )
            out = branch if out is None else out.unionByName(branch)
        return out

    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    qm = np.asarray([queries[qid] for qid in qids], dtype=np.float64)
    qid_arr = np.asarray(qids, dtype=np.int64)
    q_norm = np.sqrt((qm * qm).sum(axis=1))
    ball_sets = {
        int(qid): [frozenset(b) for b in balls[qid]] for qid in qids
    }

    def gen(batches):
        for pdf in batches:
            x, null_mask = _stack_nullable(pdf[vec_col].to_numpy(), dim)
            # zero-norm exclusion — the cosine_topk candidate rule
            # (ADVICE r14: numpy ranks the NaN last, Spark first)
            keep0 = ~null_mask & ((x * x).sum(axis=1) > 0)
            if not keep0.any():
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)[keep0]
            sig_mat = np.stack(
                [pdf[c].to_numpy(dtype=np.int64)[keep0] for c in sig_cols],
                axis=1,
            )
            x = x[keep0]
            sims = (x @ qm.T) / (
                np.sqrt((x * x).sum(axis=1))[:, None] * q_norm[None, :]
            )
            r = _round_half_up_np(sims, 4)
            parts = []
            for qi, qid in enumerate(qid_arr):
                keep = np.zeros(len(ids), dtype=bool)
                for ti in range(len(sig_cols)):
                    keep |= np.isin(
                        sig_mat[:, ti], list(ball_sets[int(qid)][ti])
                    )
                if exclude_query_ids:
                    keep &= ids != qid
                if not keep.any():
                    continue
                col = r[keep, qi]
                order = np.lexsort((ids[keep], -col))[:k]
                parts.append(
                    pd.DataFrame(
                        {
                            "query_id": np.full(
                                int(order.size), qid, dtype=np.int32
                            ),
                            id_col: ids[keep][order],
                            "cos_sim": col[order],
                        }
                    )
                )
            if parts:
                yield pd.concat(parts, ignore_index=True)

    local = scoped.select(id_col, vec_col, *sig_cols).mapInPandas(
        gen, schema=f"query_id int, {id_col} {id_t}, cos_sim double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col(id_col)
    )
    return (
        local.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmeans(
    df: DataFrame,
    k: int = 8,
    iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
    assignment: str = "seq",
    transport: str = "closure",
) -> DataFrame:
    """Deterministic Euclidean k-means corpus clustering (plain Lloyd —
    the domain-discovery / cluster-balanced-mixing companion to the
    spherical ``ivf_fit_centroids`` quantizer): centroids seed from the
    ``k`` lowest-id vectors (data-derived, no RNG), iterations are
    fixed-count, and every updated centroid coordinate is ROUNDED to
    ``round_dp`` decimals — that rounding is what makes the whole
    trajectory exactly replayable cross-engine (a DuckDB oracle
    re-derives every iteration; un-rounded averages differ in the last
    ulp between engines/summation orders and the argmin near a
    boundary would flip). Returns (id_col, cluster) for EVERY input
    row — cluster is the seed index 0..k-1, NULL for NULL vectors.
    Empty clusters keep their previous centroid. Distance ties break
    to the lower cluster id.

    Scale: centroids are driver metadata (k × dim floats — the only
    thing collected); each iteration is one narrow assignment pass +
    one groupBy(cluster) partial-agg of per-dimension means (k × dim
    scalars shuffled).

    ``assignment`` picks the physical plan of every assignment pass
    (each Lloyd iteration AND the final labeling):

    - ``"seq"`` (default since round 16, the oracle path): the
      BIT-EXACT vectorized kernel ``_seq_l2_assign_udf`` — the fold's
      sequential IEEE sums and lower-id tiebreak reproduced
      elementwise, with no literal tree to build, analyze or
      interpret.
    - ``"fold"``: the original JVM fold over LITERAL
      centroid arrays — identical bit-exact sequential sums, which the
      value-checked oracle needs. The k×dim-literal plan makes
      ANALYSIS time the bottleneck as k grows (measured: the semdedup
      geometry grid, SCALING.md) — and past k ≈ several hundred the
      codegen'd expression tree OOMs the driver JVM outright
      (measured at k=1024/dim=64, SCALING.md round-11 addendum):
      the fold's k-ceiling is a cliff, not a slope.
    - ``"arrow"``: the ``assign_clusters_arrow`` matmul kernel, one
      fresh pandas_udf per iteration closing over that iteration's
      centroid matrix; ``transport`` ("closure"/"broadcast") chooses
      the data movement exactly as documented there. Production k in
      the hundreds and beyond — trading oracle-grade tie determinism
      (BLAS summation order) for throughput, exactly as IVF does;
      parity-tested against the fold on the fixture. Under this mode
      the MEAN UPDATE also leaves the JVM: the default
      ``groupBy(cell).agg(dim × F.avg(__v[i]))`` builds one aggregate
      expression per DIMENSION and hits its own wall as dim grows
      (measured: OOMs the 1 GiB local JVM at dim=1024/n=20k while the
      Arrow path completes — SCALING.md "Round 12"), so each Lloyd
      pass folds per-cell running sums via ``_mean_update_arrow``
      (two Arrow passes, HALF_UP-rounded means) instead.
    """
    if k < 1 or iters < 0:
        raise ValueError(f"need k >= 1 and iters >= 0, got {k}, {iters}")
    if assignment not in ("fold", "seq", "arrow"):
        raise ValueError(
            f"assignment must be 'fold', 'seq' or 'arrow', got {assignment!r}"
        )
    vec = F.col(vec_col).cast("array<double>")
    seeds = (
        df.filter(vec.isNotNull())
        .orderBy(id_col)
        .limit(k)
        .select(vec.alias("v"))
        .collect()
    )
    if len(seeds) < k:
        raise ValueError(f"need >= {k} non-null vectors, got {len(seeds)}")
    cents = [[round(float(x), round_dp) for x in r.v] for r in seeds]
    dim = len(cents[0])

    def assign(cents: list[list[float]]):
        """(assignment Column, broadcast handle or None) for one pass."""
        if assignment == "arrow":
            udf, bc = _arrow_assign_udf(
                df.sparkSession, cents, transport, return_handle=True
            )
            return udf(vec), bc
        if assignment == "seq":
            # bit-exact fold values without the k × dim literal tree —
            # see _seq_l2_assign_udf (round 16)
            return _seq_l2_assign_udf(cents)(vec), None
        # array of (dist, cid) structs → array_min compares
        # lexicographically: min distance, ties to the lower cid
        entries = [
            F.struct(
                F.aggregate(
                    F.zip_with(
                        vec,
                        F.array(*[F.lit(c) for c in cvec]),
                        lambda x, y: (x - y) * (x - y),
                    ),
                    F.lit(0.0),
                    lambda acc, d: acc + d,
                ).alias("d"),
                F.lit(cid).alias("c"),
            )
            for cid, cvec in enumerate(cents)
        ]
        return F.array_min(F.array(*entries))["c"].cast("int"), None

    import numpy as np  # noqa: PLC0415

    def _half_up(arr, dp: int):
        # Spark F.round semantics (HALF_UP, away from zero) — the
        # _semdedup_pairs_kernel discipline, applied to the mean
        scale = 10.0 ** dp
        return (np.sign(arr) * np.floor(np.abs(arr) * scale + 0.5) / scale).tolist()

    for _ in range(iters):
        assign_col, iter_bc = assign(cents)
        members = df.filter(vec.isNotNull()).select(
            assign_col.alias("__c"), vec.alias("__v")
        )
        if assignment == "arrow":
            # wide-dim escape hatch: the dim × F.avg agg's expression
            # count stops scaling with dim (OOMs the 1 GiB local JVM at
            # dim=1024 — SCALING.md); two Arrow passes replace it
            upd = _mean_update_arrow(members, dim)
            updated = {
                c: _half_up(sums / n, round_dp) for c, (n, sums) in upd.items()
            }
        else:
            means = members.groupBy("__c").agg(
                *[
                    F.round(F.avg(F.col("__v")[i]), round_dp).alias(f"c{i}")
                    for i in range(dim)
                ]
            ).collect()
            updated = {
                r["__c"]: [float(r[f"c{i}"]) for i in range(dim)] for r in means
            }
        if iter_bc is not None:
            # this pass's centroid broadcast was consumed by the
            # mean-update collect above — release the executor copies
            # now instead of waiting on GC to reach the ContextCleaner
            iter_bc.unpersist()
        cents = [updated.get(cid, cvec) for cid, cvec in enumerate(cents)]
    # the FINAL labeling's broadcast must stay alive: it ships with the
    # returned (lazy) plan
    final_col, _final_bc = assign(cents)
    return df.select(
        F.col(id_col),
        F.when(vec.isNotNull(), final_col).alias("cluster"),
    )


def _mean_update_arrow(members: DataFrame, dim: int) -> dict:
    """Per-cell centroid mean update as TWO Arrow passes — the wide-dim
    escape hatch for the ``groupBy(cell).agg(dim × F.avg(__v[i]))``
    update, whose per-dimension aggregate EXPRESSIONS stop scaling as
    dim grows (measured: at dim=1024/n=20k the agg form OOMs the 1 GiB
    local JVM outright while this path completes — SCALING.md
    "Round 12: wide-dim centroid update").

    Stage 1 (``mapInPandas``): each Arrow batch reduces to at most k
    partial rows (cell, count, dim-wide running sum) — one numpy
    ``sum(axis=0)`` per cell present in the batch, so the shuffle
    carries O(batches × k) dim-wide rows, never the corpus. Stage 2
    folds per cell (``applyInPandas``); above 64 producing partitions a
    SALTED pre-fold runs first — partials combine per
    (cell, partition-id % 64) group, so the final per-cell group sees
    at most 64 rows regardless of task count: a 10⁶-task fit feeds the
    hot cell ~15k-row salted groups, then a 64-row final group, never a
    million-row pandas frame. (Below the salt width the pre-fold is
    pure stage latency — ~1.5 s measured — so it is skipped.) Exactly
    k rows — the k × dim centroid matrix that reaches the driver
    anyway — are collected.

    Float caveat (same as the Arrow assignment kernel): partial sums
    add in batch order, not the agg's shuffle order — last-ulp
    differences vs the JVM agg are expected; a NULL ELEMENT inside a
    vector becomes NaN and poisons its cell's mean for that dimension
    (the agg form's per-dimension null-skip is the oracle behavior).

    ``members`` must be (``__c`` int cell, ``__v`` array<double>) with
    whole-NULL vectors already filtered (kmeans/IVF both do). Returns
    {cell: (count, np.ndarray sums)} — empty cells simply absent.
    """
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql import types as T  # noqa: PLC0415

    part_schema = T.StructType(
        [
            T.StructField("__c", T.IntegerType()),
            T.StructField("__cnt", T.LongType()),
            T.StructField("__sums", T.ArrayType(T.DoubleType())),
        ]
    )

    def _partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            cells = pdf["__c"].to_numpy()
            m, mask = _stack_nullable(pdf["__v"], dim)
            keep = ~mask
            out_c, out_n, out_s = [], [], []
            for c in np.unique(cells[keep]):
                sel = keep & (cells == c)
                out_c.append(int(c))
                out_n.append(int(sel.sum()))
                out_s.append(m[sel].sum(axis=0).tolist())
            yield pd.DataFrame({"__c": out_c, "__cnt": out_n, "__sums": out_s})

    partials = members.mapInPandas(_partials, schema=part_schema)

    def _combine(key, pdf):
        s = np.array(pdf["__sums"].tolist(), dtype=np.float64).sum(axis=0)
        return pd.DataFrame(
            {
                "__c": [int(key[0])],
                "__cnt": [int(pdf["__cnt"].sum())],
                "__sums": [s.tolist()],
            }
        )

    def _combine_salted(key, pdf):
        out = _combine((key[0],), pdf)
        out["__salt"] = np.int32(key[1])
        return out

    # the salted pre-fold only pays for itself when MANY tasks feed the
    # same cell; below the salt width each (cell, salt) group would hold
    # ~1 row and the extra stage is pure latency (~1.5 s measured)
    if partials.rdd.getNumPartitions() > 64:
        partials = (
            partials.withColumn(
                "__salt", F.pmod(F.spark_partition_id(), F.lit(64))
            )
            .groupBy("__c", "__salt")
            .applyInPandas(
                _combine_salted,
                # NOT part_schema.add(...): StructType.add mutates in
                # place and would pollute the final combine's schema
                schema=T.StructType(
                    list(part_schema.fields)
                    + [T.StructField("__salt", T.IntegerType())]
                ),
            )
            .drop("__salt")
        )
    combined = partials.groupBy("__c").applyInPandas(_combine, schema=part_schema)
    return {
        r["__c"]: (r["__cnt"], np.asarray(r["__sums"], dtype=np.float64))
        for r in combined.collect()
    }


def _semdedup_pairs_kernel(
    v: DataFrame,
    id_col: str,
    threshold: float,
    cos_dp: int,
    block: int = 2048,
) -> DataFrame:
    """The giant-cluster pair stage for ``semdedup`` — one
    ``applyInPandas`` group per cluster, counting for every member the
    LOWER-id members whose rounded cosine reaches ``threshold``.

    ``v`` is semdedup's normalized frame: (id_col, __u unit vector,
    cluster). Cosine of unit vectors is a plain dot product, so the
    whole cluster reduces to U @ Uᵀ — computed in ROW BLOCKS of
    ``block`` so peak memory is block×m×8 bytes instead of m²×8 (a
    10⁴-member cluster: 160 MB per block vs 800 MB for the full
    matrix). Corrupt vectors (NULL elements → NaN after the float
    cast) propagate NaN cosines whose comparisons are False — never
    flagged, never counted as anyone's earlier dup, exactly the join
    form's NULL-cosine semantics. Only ids with a positive count are
    returned (the join form's sparse dup_counts contract). Rounding
    matches Spark ``F.round`` (HALF_UP, half away from zero) rather
    than numpy's default round-half-to-even, so exact half-way values
    at ``cos_dp`` agree with the join form; the only remaining parity
    caveat is BLAS summation ORDER inside the dot product itself.

    Scale: the shuffle is the SAME cluster-keyed exchange the join
    form pays (one partition per cluster group); what changes is the
    per-pair cost — a BLAS fused multiply-add instead of O(dim)
    interpreted lambda steps. Crossover vs the join form is measured
    in SCALING.md ("Round 10: semdedup pair-stage crossover").
    """
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql import types as T  # noqa: PLC0415

    out_schema = T.StructType(
        [
            T.StructField(id_col, v.schema[id_col].dataType),
            T.StructField("n_dups_earlier", T.IntegerType()),
        ]
    )

    def _pairs(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(id_col, kind="mergesort")
        m = len(pdf)
        if m < 2:
            return pd.DataFrame({id_col: pdf[id_col].iloc[:0], "n_dups_earlier": []})
        u = np.array(pdf["__u"].tolist(), dtype=np.float64)
        counts = np.zeros(m, dtype=np.int64)
        scale = 10.0 ** cos_dp
        for start in range(0, m, block):
            end = min(start + block, m)
            dots = u[start:end] @ u.T
            # HALF_UP (away from zero) to match Spark F.round, not
            # numpy's banker's rounding; NaN propagates through both
            # sign and floor, keeping corrupt-vector semantics.
            sims = np.sign(dots) * np.floor(np.abs(dots) * scale + 0.5) / scale
            earlier = np.arange(m)[None, :] < np.arange(start, end)[:, None]
            counts[start:end] = ((sims >= threshold) & earlier).sum(axis=1)
        hit = counts > 0
        return pd.DataFrame(
            {
                id_col: pdf[id_col].to_numpy()[hit],
                "n_dups_earlier": counts[hit].astype(np.int32),
            }
        )

    return (
        v.select(id_col, "__u", "cluster")
        .groupBy("cluster")
        .applyInPandas(_pairs, out_schema)
    )


def semdedup(
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
    cos_dp: int = 4,
    materialize: bool = False,
    pair_stage: str = "join",
    assignment: str = "seq",
    transport: str = "closure",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    public method): k-means-cluster the embedding corpus, compare
    cosine similarity only WITHIN each cluster, and drop every vector
    that is ≥ ``threshold``-similar to a LOWER-id member of its
    cluster (the deterministic stand-in for the paper's arbitrary
    keeper choice). Returns (id_col, cluster, n_dups_earlier, kept)
    for every input row — the annotate-then-filter shape of the
    quality ladder, so attrition stays auditable. NULL vectors get a
    NULL cluster and are kept (nothing to compare).

    This is the embedding-space complement of the surface near-dup
    ladder: MinHash/SimHash find docs sharing n-grams; semdedup finds
    semantic copies sharing none (translations, templated rewrites) —
    ``dedup.semantic_dupes``'s exact O(n²) baseline made scalable by
    the cluster partition.

    Scale: the whole point of the method — the O(n²) pairwise cosine
    is fenced inside clusters, so work is sum over clusters of
    |cluster|² instead of n². Production k grows with corpus
    (SemDeDup used 50k clusters for LAION) keeping clusters small and
    bounded; the pair join is an equi-join on cluster id (one shuffle
    keyed by cluster — skewed clusters hurt, which is an argument for
    larger k, not salting: the cap IS the cluster size). The k-means
    fit itself collects only k×dim centroid metadata
    (``similarity.kmeans``).

    Precision knobs (ADVICE r9): ``round_dp`` governs ONLY the k-means
    centroid trajectory (forwarded to ``kmeans`` — the cross-engine
    ulp fence, NOTES.md); ``cos_dp`` governs the pairwise cosine that
    feeds the threshold decision. They are separate because the
    batch-17 oracle pins the cosine at 4 dp — changing ``round_dp``
    must not silently move the similarity rounding.

    ``pair_stage`` picks the physical plan for the within-cluster
    pairing (VERDICT r9 item 4 — the last giant-cluster knob):

    - ``"join"`` (default, the oracle path): self equi-join on cluster
      id + one interpreted dot fold per pair. Per-pair cost is
      O(dim) interpreted lambda steps, so a cluster of m members costs
      m²·dim lambda steps — fine while production k keeps m ≈ 10³.
    - ``"kernel"`` (the giant-cluster scale path): one
      ``applyInPandas`` group per cluster computing the m×m cosine
      matrix as BLOCKED BLAS matmuls (row blocks of 2048 bound peak
      memory to block×m×8 bytes; U itself is m×dim). Crossover
      measured in SCALING.md ("Round 10: semdedup pair-stage
      crossover"). Same float caveat as ``assign_clusters_arrow``:
      BLAS sums in a different order than the JVM fold, so a pair
      sitting exactly on the ``cos_dp`` rounding boundary could flip —
      the fixture parity test passes exactly, but the value-checked
      oracle query keeps the fold form. Memory contract: one CLUSTER
      (m×dim float64) must fit an executor task — with SemDeDup-scale
      k that is by construction; a cluster that doesn't fit means k is
      too small for the corpus, which the join form wouldn't survive
      either (m² pairs).

    ``assignment`` / ``transport`` forward to ``kmeans`` — the full
    production configuration for SemDeDup-scale k (50k clusters) is
    ``assignment="arrow", transport="broadcast", pair_stage="kernel"``:
    matmul assignment passes, one broadcast of the centroid matrix per
    executor, BLAS pair stage — while the default keeps every stage on
    the oracle-deterministic JVM-fold path.
    """
    if pair_stage not in ("join", "kernel"):
        raise ValueError(f"pair_stage must be 'join' or 'kernel', got {pair_stage!r}")
    if not 0.0 < threshold <= 1.0:
        # strictly positive: at 0.0 every zero-norm vector would pair
        # with its whole cluster through cos 0.0 >= 0.0 — similarity
        # zero is the definition of NOT a duplicate
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    assign = kmeans(
        df, k=k, iters=iters, id_col=id_col, vec_col=vec_col,
        round_dp=round_dp, assignment=assignment, transport=transport,
    )
    if materialize:
        # the assignment (a k×dim JVM argmin fold per row) feeds the
        # pair join TWICE (both sides) and the output join once —
        # materialize the narrow (id, cluster) rows instead of running
        # the fold three times (opt-in, keeps the operator lazy)
        assign = assign.localCheckpoint(eager=True)
    # UNIT-normalize once per vector (O(n) folds), so the pair stage —
    # the O(Σ|cluster|²) hot path — is a single dot fold per pair
    # instead of dot + two norm folds: cosine(a, b) == dot(â, b̂). The
    # oracle replays the same normalize-then-dot form so the float
    # path matches operation for operation.
    vec = F.col(vec_col).cast("array<double>")
    v = (
        df.select(F.col(id_col), vec.alias("__v"))
        # norm routed through its own column FIRST: referencing norm()
        # inside the transform lambda would re-run the whole fold per
        # element (interpreted HOFs share no subexpressions — NOTES.md).
        # Zero-norm vectors map to the zero unit vector (x/0.0 would be
        # NULL/NaN and silently skip even byte-identical zero pairs;
        # dot(0⃗, ·) = 0 never reaches the required-positive threshold —
        # defined, deterministic, and replayed by the oracle's CASE).
        # A NULL norm (a NULL ELEMENT inside the vector — corrupt
        # input) falls through BOTH whens to NULL elements: corruption
        # propagates as NULL cosine → never flagged, never rewritten
        # to a fake zero vector.
        .withColumn("__n", norm(F.col("__v")))
        .select(
            F.col(id_col),
            F.transform(
                F.col("__v"),
                lambda x: F.when(F.col("__n") > 0, x / F.col("__n"))
                .when(F.col("__n") == 0, F.lit(0.0)),
            ).alias("__u"),
        )
        .join(assign, id_col)
        .filter(F.col("cluster").isNotNull())
    )
    if materialize:
        v = v.localCheckpoint(eager=True)
    if pair_stage == "kernel":
        dup_counts = _semdedup_pairs_kernel(v, id_col, threshold, cos_dp)
    else:
        # Pair-stage parallelism (round 16): the (id, cluster, unit)
        # rows are bytes-tiny but each joined pair costs a dim-length
        # interpreted dot fold, so AQE's byte-based coalescing starves
        # the pair stage (observed 1 task carrying 1.3 s of executor
        # CPU at sf0.1 — the q_lsh_cosine_near_pairs disease in
        # miniature). An explicit NUMBERED repartition on the join key
        # is exempt from coalescing and satisfies the join requirement
        # on both sides, so no extra exchange appears in the join
        # itself; width follows defaultParallelism, not a local
        # constant.
        v = v.repartition(
            v.sparkSession.sparkContext.defaultParallelism, F.col("cluster")
        )
        a, b = v.alias("a"), v.alias("b")
        dup_counts = (
            a.join(
                b,
                (F.col("a.cluster") == F.col("b.cluster"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            )
            .select(
                F.col(f"b.{id_col}").alias(id_col),
                F.round(dot(F.col("a.__u"), F.col("b.__u")), cos_dp).alias("__cos"),
            )
            .filter(F.col("__cos") >= threshold)
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("int").alias("n_dups_earlier"))
        )
    return (
        assign.join(dup_counts, id_col, "left")
        .select(
            F.col(id_col),
            F.col("cluster"),
            F.coalesce(F.col("n_dups_earlier"), F.lit(0)).alias("n_dups_earlier"),
            (F.coalesce(F.col("n_dups_earlier"), F.lit(0)) == 0)
            .cast("int")
            .alias("kept"),
        )
    )


def assign_clusters_arrow(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    transport: str = "closure",
) -> DataFrame:
    """The Arrow-matmul cluster assignment — the production swap the
    ``kmeans`` docstring promises for k in the hundreds, where the
    JVM-fold form's k×dim-LITERAL plan makes analysis time the
    bottleneck (measured: the semdedup geometry grid, SCALING.md).
    Returns (id_col, cluster) with the same contract as ``kmeans``'s
    assignment: NULL vector → NULL cluster, distance ties → the lower
    cluster id (``np.argmin`` returns the first minimum).

    One batched matmul per Arrow batch: argmin_c |v−c|² = argmin_c
    (|c|² − 2·v·c) — |v|² is constant per row and drops out, so the
    kernel computes V @ Cᵀ once ((batch × dim) @ (dim × k)) plus a
    k-vector of centroid norms.

    ``transport`` picks how the centroid matrix reaches executors:
    ``"closure"`` (default) rides the UDF closure — right for model
    metadata through k in the THOUSANDS (k=10³ × dim=10³ float64 =
    8 MB, re-serialized per task but trivially); ``"broadcast"`` ships
    it ONCE per executor as a Spark broadcast variable the kernel
    dereferences — the SemDeDup-scale transport (50k × 10³ = 400 MB:
    closure serialization per task would dominate the job). The two
    are bit-identical in output (same matrix, same argmin — parity
    test); the knob is purely a data-movement choice. The broadcast
    variable's executor-side copy lives until the returned plan (and
    its UDF closure) is garbage-collected — the standard Spark
    broadcast lifetime, fine for a model that outlives the query.

    Float caveat, why this is NOT the oracle path: BLAS dot products
    sum in a different order than the JVM fold, so a vector equidistant
    to two centroids at the last ulp can flip — the fixture-scale
    parity test passes exactly, but oracle-grade determinism keeps the
    fold form (``kmeans`` default) for value-checked queries.
    """
    assign = _arrow_assign_udf(df.sparkSession, centroids, transport)
    return df.select(
        F.col(id_col),
        assign(F.col(vec_col).cast("array<double>")).alias("cluster"),
    )


def _arrow_assign_udf(spark: SparkSession, centroids: list[list[float]],
                      transport: str, return_handle: bool = False):
    """The Arrow argmin-assignment kernel as a reusable scalar
    pandas_udf — shared by ``assign_clusters_arrow`` (one-shot
    assignment against fixed centroids) and ``kmeans(assignment=
    "arrow")`` (one fresh UDF per Lloyd iteration, each closing over
    that iteration's centroid matrix).

    ``return_handle=True`` returns ``(udf, broadcast-or-None)`` so the
    caller can ``unpersist()`` a transport="broadcast" matrix once its
    plan has executed — kmeans' Lloyd loop would otherwise accumulate
    one live executor copy per iteration (at the SemDeDup scale the
    docstrings target, ~400 MB each) until Python GC happens to reach
    the ContextCleaner."""
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

    if transport not in ("closure", "broadcast"):
        raise ValueError(
            f"transport must be 'closure' or 'broadcast', got {transport!r}"
        )
    cmat = np.asarray(centroids, dtype=np.float64)
    if cmat.ndim != 2 or cmat.shape[0] < 1:
        raise ValueError(f"need a non-empty k x dim centroid matrix, got {cmat.shape}")
    cnorm2 = (cmat * cmat).sum(axis=1)
    dim = cmat.shape[1]

    # the _ivf_assign_pandas idiom: scalar pandas_udf returning nullable
    # Int32 (pd.NA for null vectors) — no hand-built output schema, no
    # NaN sentinel round-trip. The two transports are SEPARATE closures:
    # a shared body with a broadcast-or-matrix fallback would capture
    # the matrix in the closure either way and defeat the broadcast.
    def _kernel(vecs, c, n2):
        m, nullmask = _stack_nullable(vecs, dim)
        scores = n2[None, :] - 2.0 * (m @ c.T)
        best = pd.array(scores.argmin(axis=1).astype(np.int32), dtype="Int32")
        best[nullmask] = pd.NA
        return pd.Series(best)

    bc = None
    if transport == "broadcast":
        bc = spark.sparkContext.broadcast((cmat, cnorm2))

        def _assign(vecs):
            c, n2 = bc.value
            return _kernel(vecs, c, n2)

    else:

        def _assign(vecs):
            return _kernel(vecs, cmat, cnorm2)

    udf = pandas_udf(_assign, "int")
    return (udf, bc) if return_handle else udf


# =============================================================================
# Product quantization (PQ) — the memory-compression ANN tier
# =============================================================================

def _pq_half_up(x: float, dp: int) -> float:
    """Python-side HALF_UP rounding PROVABLY matching Spark ``F.round``:
    Spark rounds via ``BigDecimal.valueOf(d)`` (= the shortest decimal
    string ``Double.toString`` emits) ``.setScale(dp, HALF_UP)``;
    Python's ``repr(float)`` is the same shortest round-trip decimal,
    so ``Decimal(repr(x)).quantize(..., ROUND_HALF_UP)`` reproduces the
    JVM result digit-for-digit — including the values where the old
    ``floor(|x|*scale + 0.5)`` spelling diverged because ``|x|*scale``
    FP-rounds across the .5 boundary (e.g. 80.585*100 = 8058.4999…9 →
    floor gives 80.58 while BigDecimal HALF_UP on the shortest decimal
    80.585 gives 80.59 — ADVICE r12 item 3; pinned by
    ``test_pq_half_up_matches_spark_round``. NOT the folklore 2.675:
    ITS product rounds to exactly 267.5, so the spellings agree there —
    measured r14). Python's builtin
    ``round`` is banker's and diverges on every exact .5.

    DuckDB ``ROUND`` stays the one intentional third party: it rounds
    the scaled DOUBLE, so on adversarial boundary values it can differ
    from BigDecimal — the oracle fixtures absorb that (documented
    cross-engine risk); what this function guarantees is that the
    Python seed path and the Spark iteration path can never disagree
    with EACH OTHER."""
    from decimal import ROUND_HALF_UP, Decimal  # noqa: PLC0415

    q = Decimal(1).scaleb(-dp)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def _round_half_up_np(arr, dp: int):
    """ONE vectorized HALF_UP kernel shared by every Arrow serving path
    (``pq_adc_topk_multi``/``ivfpq_topk_multi`` arrow modes — ADVICE
    r13: the two private copies had already drifted on sign handling).

    Rounds the scaled DOUBLE: ``floor(|x|·10^dp + 0.5)·sign(x)/10^dp``,
    with exact zeros forced to +0.0. This is deliberately NOT
    bit-identical to ``_pq_half_up``/Spark ``F.round`` on the
    measure-zero boundary set where ``|x|·10^dp`` FP-rounds across the
    .5 boundary (80.585·100 = 8058.4999…9 → this kernel 80.58,
    BigDecimal HALF_UP on the shortest decimal 80.585 gives
    80.59): the arrow modes trade that last-ulp boundary for the
    single-scan vectorized plan. The divergence is pinned by
    ``test_round_half_up_np_boundary_divergence``; oracle-grade paths
    use the fold modes, which round with ``F.round`` exactly."""
    import numpy as np  # noqa: PLC0415

    scale = 10.0 ** dp
    out = np.floor(np.abs(arr) * scale + 0.5) / scale * np.sign(arr)
    out[arr == 0.0] = 0.0
    return out


def _pq_subvec(vec: Column, j: int, sub: int) -> Column:
    """Subspace ``j``'s slice of an array<double> vector (1-based slice)."""
    return F.slice(vec, j * sub + 1, sub)


def _pq_argmin(vec: Column, j: int, book: list[list[float]], sub: int) -> Column:
    """Nearest-codeword id for subspace ``j``, bit-exact and oracle-
    replayable: each distance is the sequential left-to-right squared-L2
    fold (matches DuckDB's list_sum term-for-term in IEEE double) and
    ties go to the LOWER code id.

    Spelling (round 13): ONE ``transform`` over a literal array of
    codewords feeding ``array_position(d, array_min(d))`` — first index
    of the min, i.e. ties to the lower code. The previous per-codeword
    struct forest (k_sub × aggregate-over-zip_with subtrees under one
    array_min) computed the IDENTICAL values but paid a k_sub-times
    larger expression tree at ANALYSIS time: HOFs never enter codegen,
    so both spellings run interpreted per row — the struct forest's
    only extra cost was Catalyst walking ~1,500 nodes per subspace.
    Measured at the oracle geometry (m=16, k_sub=16, sf0.1): encode
    9.1 s → 3.5 s, fit iteration similarly; per-row work unchanged
    (parity asserted exactly before the swap, and the pure-Python
    replay tests in test_pq.py re-pin it). The fully-unrolled
    ``F.get``+add-chain spelling that wins for ADC (flat LUT) is a
    CLIFF here: m × k_sub × sub codegen'd distance expressions blow
    the janino heap at this very geometry (OOM reproduced before this
    rewrite — the pq_fit fold-cliff family)."""
    s = _pq_subvec(vec, j, sub)
    cws = F.array(*[F.array(*[F.lit(x) for x in cw]) for cw in book])
    dists = F.transform(
        cws,
        lambda cw: F.aggregate(
            F.zip_with(s, cw, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, d: acc + d,
        ),
    )
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def pq_fit(
    df: DataFrame,
    m: int = 4,
    k_sub: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
    dim: int | None = None,
    assignment: str = "seq",
) -> list[list[list[float]]]:
    """Fit product-quantization codebooks (Jégou et al. 2011, public):
    split each dim-d vector into ``m`` contiguous subvectors and run an
    independent deterministic Lloyd per subspace — returns
    ``codebooks[j][c]`` = subspace j's codeword c (k_sub × dim/m each).

    PQ is the memory tier of the ANN ladder next to SRP-LSH
    (``ann_lsh_topk``) and IVF (``ivf_fit_centroids``): a dim-64
    float32 vector is 256 bytes; its PQ code is ``m`` small ints —
    with m=8/k_sub=256 that is 8 bytes, a 32× compression that lets a
    100 TB embedding store scan codes instead of vectors
    (``pq_adc_topk``). Fit on a SAMPLE at scale (same practice as
    ``ivf_fit_centroids``); encoding the full corpus is one narrow
    pass.

    Deterministic by the ``kmeans`` discipline so the whole trajectory
    is value-replayable cross-engine: seeds = the ``k_sub`` lowest-id
    vectors' subvectors (HALF_UP-rounded to ``round_dp``), fixed-count
    iterations, per-iteration codeword means HALF_UP-rounded, empty
    codes keep their previous codeword, argmin ties to the lower code.

    Scale: ALL m subspaces update in ONE job per iteration — the m
    per-subspace assignments are computed in a single narrow pass
    (explode of m (j, code, subvec) structs) feeding a single
    groupBy(j, code) partial-agg; only m × k_sub × dim/m rounded
    doubles (the codebooks) ever reach the driver.

    ``assignment`` picks the physical plan of each iteration's argmin,
    exactly the ``kmeans`` split: ``"seq"`` (default since round 16,
    the oracle path) is the BIT-EXACT vectorized kernel
    (``_pq_seq_codes_udf`` — the fold's IEEE operation chain
    reproduced elementwise, first-min ties; measured 8.7× faster
    fit+encode at the oracle geometry); ``"fold"`` is the original
    JVM fold over literal codewords — identical values, but the
    m × k_sub × dim/m literal expression tree is paid at plan
    construction (py4j), analysis (Catalyst) AND interpreted eval
    (HOFs never codegen), and it is a CLIFF, not a slope
    (measured: executor OOM at m=8/k_sub=256/n=10k — SCALING.md round
    12); ``"arrow"`` routes every assignment through the shared
    ``_pq_arrow_codes_udf`` matmul kernel — the k_sub=256 production
    path, trading oracle-grade tie determinism exactly as kmeans does
    (parity-tested on the fixture; the mean agg is unchanged — sub
    stays small in PQ, so the agg width never walls like wide-dim
    kmeans).
    """
    if m < 1 or k_sub < 1 or iters < 0:
        raise ValueError(f"need m, k_sub >= 1 and iters >= 0, got {m}, {k_sub}, {iters}")
    if assignment not in ("fold", "seq", "arrow"):
        raise ValueError(
            f"assignment must be 'fold', 'seq' or 'arrow', got {assignment!r}"
        )
    vec = F.col(vec_col).cast("array<double>")
    seeds = (
        df.filter(vec.isNotNull())
        .orderBy(id_col)
        .limit(k_sub)
        .select(vec.alias("v"))
        .collect()
    )
    if not seeds:
        raise ValueError("cannot infer embedding dim from an empty/null column")
    if dim is None:
        # the seeds collect already carries the width — a separate
        # .first() probe job was one whole Spark round-trip of pure
        # fixed latency per fit (round 13). Geometry validation stays
        # AHEAD of the seed-count check (its historical order).
        dim = len(seeds[0].v)
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    if len(seeds) < k_sub:
        raise ValueError(f"need >= {k_sub} non-null vectors, got {len(seeds)}")
    sub = dim // m
    books = [
        [
            [_pq_half_up(float(x), round_dp) for x in r.v[j * sub:(j + 1) * sub]]
            for r in seeds
        ]
        for j in range(m)
    ]
    for _ in range(iters):
        base = df.filter(vec.isNotNull())
        if assignment in ("seq", "arrow"):
            # materialize the kernel's codes as ONE column first so the
            # m struct references below cannot re-evaluate the UDF
            kernel = (
                _pq_seq_codes_udf(books)
                if assignment == "seq"
                else _pq_arrow_codes_udf(books)
            )
            base = base.select(vec.alias("__v"), kernel(vec).alias("__codes"))
            structs = [
                F.struct(
                    F.lit(j).alias("j"),
                    F.get("__codes", j).alias("c"),
                    F.slice("__v", j * sub + 1, sub).alias("s"),
                )
                for j in range(m)
            ]
        else:
            structs = [
                F.struct(
                    F.lit(j).alias("j"),
                    _pq_argmin(vec, j, books[j], sub).alias("c"),
                    _pq_subvec(vec, j, sub).alias("s"),
                )
                for j in range(m)
            ]
        rows = base.select(F.explode(F.array(*structs)).alias("e")).select(
            "e.j", "e.c", "e.s"
        )
        means = (
            rows.groupBy("j", "c")
            .agg(
                *[
                    F.round(F.avg(F.col("s")[i]), round_dp).alias(f"m{i}")
                    for i in range(sub)
                ]
            )
            .collect()
        )
        upd = {
            (r["j"], r["c"]): [float(r[f"m{i}"]) for i in range(sub)] for r in means
        }
        books = [
            [upd.get((j, c), cw) for c, cw in enumerate(book)]
            for j, book in enumerate(books)
        ]
    return books


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    out: str = "pq_code",
    mode: str = "seq",
) -> DataFrame:
    """Attach each vector's PQ code — ``array<int>`` of length m, the
    persistable narrow column a 100 TB store keeps NEXT TO (or instead
    of) the raw vectors: ADC queries (``pq_adc_topk``) then scan only
    these few bytes per row.

    ``mode`` picks the physical plan, exactly the ``kmeans`` split:

    - ``"seq"`` (default since round 16, the oracle path): one
      Arrow-batched BIT-EXACT kernel for all subspaces
      (``_pq_seq_codes_udf``) — the fold's sequential IEEE sums and
      first-min ties reproduced elementwise, without the literal
      tree's plan-construction / analysis / interpretation cost
      (measured 5–14× on the encode pass at the oracle geometry).
    - ``"fold"``: the original per-subspace argmin as a JVM fold over
      literal codewords — identical values, value-replayable. Literal
      count is m × k_sub × dim/m; the same analysis-cost ceiling as
      the kmeans fold as k_sub grows.
    - ``"arrow"``: one Arrow-batched kernel for ALL subspaces — per
      batch, m small matmuls via the ‖x‖² − 2x·c + ‖c‖² expansion,
      argmin per subspace. The production path for k_sub=256
      codebooks; trades oracle-grade tie determinism for throughput
      (BLAS summation order), parity-tested on the fixture.

    NULL vectors get NULL codes (no crash) in every mode.
    """
    if mode not in ("fold", "seq", "arrow"):
        raise ValueError(f"mode must be 'fold', 'seq' or 'arrow', got {mode!r}")
    m = len(codebooks)
    sub = len(codebooks[0][0])
    vec = F.col(vec_col).cast("array<double>")
    if mode == "fold":
        codes = F.array(*[_pq_argmin(vec, j, codebooks[j], sub) for j in range(m)])
        return df.withColumn(out, F.when(vec.isNotNull(), codes))
    if mode == "seq":
        return df.withColumn(out, _pq_seq_codes_udf(codebooks)(vec))
    return df.withColumn(out, _pq_arrow_codes_udf(codebooks)(vec))


def _pq_arrow_codes_udf(codebooks: list[list[list[float]]]):
    """Arrow-batched all-subspace PQ codes: per batch, one small matmul
    per subspace via the ‖x‖² − 2x·c + ‖c‖² expansion, argmin per
    subspace → array<int>. Shared by ``pq_encode(mode="arrow")`` and
    ``pq_fit(assignment="arrow")`` — the production kernel wherever the
    fold's m × k_sub × dim/m literal expression tree stops scaling
    (measured: executor OOM at m=8/k_sub=256 — SCALING.md round 12,
    the kmeans fold k-cliff reproduced in PQ)."""
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

    m = len(codebooks)
    sub = len(codebooks[0][0])
    mats = [np.asarray(b, dtype=np.float64) for b in codebooks]  # m × (k_sub × sub)
    norms = [(c * c).sum(axis=1) for c in mats]
    dim = m * sub

    def _encode(vecs):
        x, mask = _stack_nullable(vecs, dim)
        cols = []
        for j in range(m):
            xs = x[:, j * sub:(j + 1) * sub]
            scores = norms[j][None, :] - 2.0 * (xs @ mats[j].T)
            cols.append(scores.argmin(axis=1).astype(np.int32))
        stacked = np.stack(cols, axis=1) if len(x) else np.zeros((0, m), np.int32)
        return pd.Series(
            [None if mask[i] else stacked[i].tolist() for i in range(len(x))]
        )

    return pandas_udf(_encode, "array<int>")


def _pq_seq_codes_udf(codebooks: list[list[list[float]]]):
    """Arrow-batched BIT-EXACT PQ codes — the fold's values at kernel
    speed (round 16). Each subspace distance is accumulated over the
    sub dimensions with EXPLICIT elementwise numpy adds in the fold's
    left-to-right order — ``(0 + t₀²) + t₁² + …`` element for element
    the same IEEE-double operation chain as
    ``aggregate(zip_with(s, cw, (x-y)²), 0.0, acc+d)`` — and
    ``argmin`` takes the FIRST minimum (ties to the lower code), so
    the result is bit-identical to ``_pq_argmin``'s fold, unlike the
    BLAS ``‖x‖² − 2x·c + ‖c‖²`` expansion in ``_pq_arrow_codes_udf``
    (pairwise summation, different rounding). NaN distances rank last
    (the JVM ``array_min`` treats NaN as greatest); NULL vectors get
    NULL codes.

    Why it exists: the fold's m × k_sub × dim/m literal tree is paid
    THREE times per query — ~1,000 py4j ``F.lit`` round-trips at plan
    construction, Catalyst walking the tree at analysis, and
    interpreted (never codegen'd) HOF evaluation per row. This kernel
    moves the same arithmetic into one vectorized pass per Arrow
    batch with the codebooks riding the closure — no literals, no
    interpretation — while keeping every bit of the oracle contract
    (pinned by the python-replay tests in test_pq.py)."""
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

    m = len(codebooks)
    sub = len(codebooks[0][0])
    mats = [np.asarray(b, dtype=np.float64) for b in codebooks]  # m × (k_sub × sub)
    dim = m * sub

    def _encode(vecs):
        x, mask = _stack_nullable(vecs, dim)
        n = len(x)
        cols = []
        for j in range(m):
            d = None
            for z in range(sub):
                t = x[:, j * sub + z][:, None] - mats[j][:, z][None, :]
                sq = t * t  # (n × k_sub)
                d = sq if d is None else d + sq
            d[np.isnan(d)] = np.inf  # NaN ranks last, as in array_min
            cols.append(d.argmin(axis=1).astype(np.int32))
        stacked = np.stack(cols, axis=1) if n else np.zeros((0, m), np.int32)
        return pd.Series(
            [None if mask[i] else stacked[i].tolist() for i in range(n)]
        )

    # asNondeterministic: the function is pure, but consumers filter on
    # the codes column (isNotNull, cell prune) and the optimizer's
    # filter pushdown would otherwise DUPLICATE the kernel — one
    # ArrowEvalPython below the filter, one above (guide §4.4; measured
    # two evals per scan in the round-16 before-plans). Marking it
    # non-deterministic yields a single eval; the only trade is that
    # row filters no longer push below the projection, which at the
    # fixture is k excluded ids and at scale is irrelevant — persisted
    # stores carry codes as real columns with no UDF in the plan.
    return pandas_udf(_encode, "array<int>").asNondeterministic()


def _seq_l2_assign_udf(centroids: list[list[float]]):
    """Arrow-batched BIT-EXACT L2 argmin assignment (round 16): the
    full-dim twin of ``_pq_seq_codes_udf`` — explicit elementwise
    left-to-right accumulation reproduces the JVM fold's IEEE sum
    term for term, first-min ``argmin`` reproduces the
    ``array_min``-over-(d, c)-structs tiebreak (lower id wins), NaN
    distances rank last, NULL vectors → NULL. Shared by the ``"seq"``
    assignment modes of ``kmeans`` and ``ivf_assign_fold`` — fold
    values without the k × dim literal tree."""
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

    c = np.asarray(centroids, dtype=np.float64)  # k × dim
    k, dim = c.shape

    def _assign(vecs):
        x, mask = _stack_nullable(vecs, dim)
        d = None
        for z in range(dim):
            t = x[:, z][:, None] - c[:, z][None, :]
            sq = t * t  # (n × k)
            d = sq if d is None else d + sq
        if d is None:
            d = np.zeros((len(x), k), dtype=np.float64)
        d[np.isnan(d)] = np.inf
        cells = pd.array(d.argmin(axis=1).astype(np.int32), dtype="Int32")
        cells[mask] = pd.NA
        return pd.Series(cells)

    # same single-eval rationale as _pq_seq_codes_udf: probe filters on
    # the assigned cell column would otherwise re-evaluate the kernel
    # below the filter (guide §4.4)
    return pandas_udf(_assign, "int").asNondeterministic()


def pq_adc_topk(
    encoded: DataFrame,
    query_vec: list[float],
    codebooks: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    codes_col: str = "pq_code",
    round_dp: int = 6,
    exclude_ids: tuple[int, ...] = (),
    refine_n: int = 0,
    vectors: DataFrame | None = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance (ADC) approximate top-k over PQ codes: the
    query's m × k_sub lookup table of exact subspace distances is
    computed DRIVER-side (metadata — m·k_sub doubles) and shipped as a
    literal; each row's approximate squared L2 is then a pure JVM fold
    of m table lookups over its code — no Python, no join, no shuffle
    beyond the TakeOrderedAndProject k-heap. This is what makes PQ the
    100 TB scan tier: the pass reads m small ints per row instead of
    the dim-sized vector.

    Output: (id_col, ``adc`` = the approximate distance HALF_UP-rounded
    to ``round_dp``), ascending, ties to the lower id — ordering is on
    the ROUNDED value (the ``cosine_topk`` discipline) so the result
    order itself is hash-stable cross-engine. LUT entries are
    left-to-right sequential sums over each subspace, the fold over m
    is sequential in j — both match DuckDB's list_sum term-for-term.

    ``refine_n`` > 0 with ``vectors`` enables the standard two-stage
    search: ADC shortlists ``max(k, refine_n)`` candidates (widened so
    a ``refine_n < k`` call still yields k rows and matches the multi
    path's width — ADVICE r14), then EXACT squared L2 against the raw
    vectors re-ranks the shortlist to the final k (one narrow join
    against the shortlist ids — recall of exact search whenever the
    true top-k survives the shortlist).
    """
    m = len(codebooks)
    lut = _pq_lut(query_vec, codebooks)
    # ONE flat literal array + an unrolled m-term sum — constant-folds
    # to a single Literal and stays inside whole-stage codegen; the
    # higher-order-function spelling (aggregate over transform with
    # nested F.get) evaluates interpreted and re-walks the literal per
    # row — measured 14× slower at n=200k/m=8/k_sub=256 (SCALING.md).
    # Left-to-right adds keep the sequential IEEE order the oracle
    # replays (list_sum over the j-ordered lut terms).
    # Round 16: ONE F.lit(list) call — a single ArrayType Literal node —
    # instead of m × k_sub separate F.lit py4j round-trips feeding a
    # CreateArray of as many child nodes (same values; the m F.get
    # references then share one leaf instead of re-walking ~256
    # children each at analysis).
    flat_lit = F.lit([float(d) for row in lut for d in row])
    adc = None
    for j in range(m):
        term = F.get(flat_lit, F.lit(j * len(lut[j])) + F.get(codes_col, j))
        adc = term if adc is None else adc + term
    scored = encoded.filter(F.col(codes_col).isNotNull()).select(
        F.col(id_col), F.round(adc, round_dp).alias("adc")
    )
    if exclude_ids:
        scored = scored.filter(~F.col(id_col).isin(*exclude_ids))
    if refine_n <= 0:
        return scored.orderBy("adc", id_col).limit(k)
    if vectors is None:
        raise ValueError("refine_n > 0 needs the raw `vectors` frame")
    shortlist = scored.orderBy("adc", id_col).limit(max(k, refine_n))
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    vcol = F.col(vec_col).cast("array<double>")
    # broadcast the tiny shortlist INTO the vector scan so the exact
    # re-rank touches only refine_n raw vectors, never the full corpus.
    # NULL raw vectors are dropped BEFORE scoring (the l2_topk
    # isNotNull discipline — ADVICE r13): a codes-only store joined to
    # a raw table carrying null embeddings would otherwise yield NULL
    # l2, which ASC NULLS FIRST ranks above every real candidate.
    candidates = vectors.filter(F.col(vec_col).isNotNull()).join(
        F.broadcast(shortlist), id_col, "inner"
    )
    return (
        candidates.select(
            F.col(id_col),
            F.col("adc"),
            F.round(
                F.aggregate(
                    F.zip_with(vcol, qlit, lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0),
                    lambda acc, d: acc + d,
                ),
                round_dp,
            ).alias("l2"),
        )
        .orderBy("l2", id_col)
        .limit(k)
    )


def _pq_lut(query_vec: list[float], codebooks: list[list[list[float]]]):
    """The m × k_sub exact-subspace-distance lookup table for one query
    (driver metadata), sequential left-to-right sums — shared by the
    single- and multi-query ADC paths."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    if len(query_vec) != m * sub:
        raise ValueError(f"query dim {len(query_vec)} != m*sub {m * sub}")
    lut = []
    for j in range(m):
        q = [float(x) for x in query_vec[j * sub:(j + 1) * sub]]
        row = []
        for cw in codebooks[j]:
            d = 0.0
            for z in range(sub):
                t = q[z] - cw[z]
                d += t * t
            row.append(d)
        lut.append(row)
    return lut


def pq_adc_topk_multi(
    encoded: DataFrame,
    queries: dict[int, list[float]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    codes_col: str = "pq_code",
    round_dp: int = 6,
    exclude_query_ids: bool = True,
    mode: str = "fold",
    refine_n: int = 0,
    vectors: DataFrame | None = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k for a BATCH of queries in one operator — the shape a
    100 TB serving layer actually runs (requests arrive in batches; the
    expensive thing is touching the code column, so touch it ONCE for
    all of them). Output: (query_id, id_col, adc), each query's top-k
    ascending, ties to the lower id — per-query rows identical to
    ``pq_adc_topk`` (parity-tested).

    ``queries`` maps query_id → vector. ``exclude_query_ids=True``
    drops each query's OWN id from its result (the self-neighbor, for
    queries drawn from the corpus — ids must share the id_col space;
    pass False for external queries).

    ``mode`` picks the physical plan, the established split:

    - ``"fold"`` (oracle path): per query, the same flat-literal-LUT
      unrolled-add projection and k-heap as ``pq_adc_topk``, unioned
      under a query_id column. Q branches over the same narrow code
      scan — the engine serves them from one cached/columnar read; the
      per-branch plan stays inside whole-stage codegen, and every adc
      value is the j-ordered sequential sum the batch-20 oracle
      replays.
    - ``"arrow"``: ONE mapInPandas pass — per Arrow batch the Q × m ×
      k_sub LUT tensor gathers all Q distances from the codes matrix
      in vectorized numpy, and each task emits only its LOCAL top-k
      per query, so the global re-rank shuffles ≤ partitions × Q × k
      rows (never n × Q). The true single-scan form; rounding is the
      vectorized HALF_UP kernel, trading the last-ulp rounding
      boundary exactly as every Arrow kernel here does
      (parity-tested on the fixture).

    ``refine_n`` > 0 enables the standard two-stage search per query
    (the ``ivfpq_topk_multi`` leg, completed here for the flat-scan
    form — VERDICT r13 item 7a): each query shortlists
    ``max(k, refine_n)`` ADC candidates (the r12 ADVICE width lesson),
    then ONE broadcast join (``_exact_rerank_multi``) re-ranks all Q
    shortlists against the raw vectors together — output gains the
    exact ``l2`` column and ordering switches to it. ``vectors``
    defaults to ``encoded`` (the single-query convention; pass the raw
    table when the store is codes-only).
    """
    if not queries:
        raise ValueError("need at least one query")
    if mode not in ("fold", "arrow"):
        raise ValueError(f"mode must be 'fold' or 'arrow', got {mode!r}")
    id_t = _validated_id_type(encoded, id_col)
    qids = sorted(queries)
    branch_k = max(k, refine_n) if refine_n > 0 else k
    if mode == "fold":
        out = None
        for qid in qids:
            branch = pq_adc_topk(
                encoded,
                queries[qid],
                codebooks,
                k=branch_k,
                id_col=id_col,
                codes_col=codes_col,
                round_dp=round_dp,
                exclude_ids=(qid,) if exclude_query_ids else (),
            ).select(
                F.lit(int(qid)).cast("int").alias("query_id"),
                F.col(id_col),
                F.col("adc"),
            )
            out = branch if out is None else out.unionByName(branch)
        if refine_n <= 0:
            return out
        return _exact_rerank_multi(
            out, vectors if vectors is not None else encoded,
            queries, k, id_col, vec_col, round_dp,
        )

    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    m = len(codebooks)
    luts = np.asarray(
        [_pq_lut(queries[qid], codebooks) for qid in qids], dtype=np.float64
    )  # Q × m × k_sub
    qid_arr = np.asarray(qids, dtype=np.int64)

    def gen(batches):
        for pdf in batches:
            mask = pdf[codes_col].notna()
            ids = pdf.loc[mask, id_col].to_numpy(dtype=np.int64)
            if not len(ids):
                continue
            codes = np.stack(pdf.loc[mask, codes_col].to_numpy()).astype(
                np.int64
            )  # n × m
            # adc[n, Q]: sequential j-ordered adds — 0 + t_0 + t_1 + …
            # matches the fold's left-to-right IEEE order term for term
            adc = np.zeros((len(ids), len(qids)), dtype=np.float64)
            for j in range(m):
                adc += luts[:, j, :][:, codes[:, j]].T
            r = _round_half_up_np(adc, round_dp)
            parts = []
            for qi, qid in enumerate(qid_arr):
                col = r[:, qi]
                keep = np.ones(len(ids), dtype=bool)
                if exclude_query_ids:
                    keep = ids != qid
                order = np.lexsort((ids[keep], col[keep]))[:branch_k]
                sel_ids, sel_adc = ids[keep][order], col[keep][order]
                parts.append(
                    pd.DataFrame(
                        {
                            "query_id": np.full(len(sel_ids), qid, dtype=np.int32),
                            id_col: sel_ids,
                            "adc": sel_adc,
                        }
                    )
                )
            yield pd.concat(parts, ignore_index=True)

    local = encoded.mapInPandas(
        gen, schema=f"query_id int, {id_col} {id_t}, adc double"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adc").asc(), F.col(id_col))
    ranked = (
        local.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= branch_k)
        .drop("__rn")
    )
    if refine_n <= 0:
        return ranked
    return _exact_rerank_multi(
        ranked, vectors if vectors is not None else encoded,
        queries, k, id_col, vec_col, round_dp,
    )


def ivfpq_topk(
    df: DataFrame,
    query_vec: list[float],
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str | None = None,
    codes_col: str | None = None,
    round_dp: int = 6,
    exclude_ids: tuple[int, ...] = (),
    refine_n: int = 0,
    coarse_metric: str = "cosine",
) -> DataFrame:
    """IVF-PQ approximate top-k — the two index tiers COMPOSED the way a
    100 TB store runs them (the public FAISS ``IVF,PQ`` architecture,
    Jégou et al. 2011): the coarse quantizer prunes to the ``nprobe``
    cells nearest the query (partition pruning when the store is laid
    out by ``cell_col``), then the ADC pass scans only the PROBED
    cells' m-int code column — pruning × compression, so a query
    touches nprobe/k_cells of the corpus at ~dim·8/m of the bytes.

    This is the NON-RESIDUAL variant: one GLOBAL codebook over raw
    vectors, so the persisted code column is cell-independent — one
    encode pass serves every query and re-clustering the coarse tier
    never re-encodes. (Residual PQ — codes on x − centroid — buys
    accuracy at the cost of per-cell LUTs and cell-coupled codes;
    at the storage layout this engine targets, the global-codebook
    trade is the operational one. ``refine_n`` recovers exactness
    the same way either way.)

    With precomputed ``cell_col``/``codes_col`` (the persisted-store
    shape: `ivf_assign` + `pq_encode` written once) the query plan is a
    narrow predicate + literal-LUT scan + k-heap — no Python, no
    shuffle. Missing columns are attached on the fly (one Arrow pass
    each) for ad-hoc use. ``refine_n`` re-ranks an ADC shortlist
    against the raw vectors in ``df`` (exact squared L2, broadcast
    shortlist join), the standard two-stage recipe.
    """
    probe_cells = _probe_cells(centroids, query_vec, nprobe, coarse_metric)
    work = df
    if cell_col is None:
        work = ivf_assign(work, centroids, vec_col, "__ivfpq_cell", coarse_metric)
        cell_col = "__ivfpq_cell"
    if codes_col is None:
        work = pq_encode(work, codebooks, vec_col, "__ivfpq_code", mode="arrow")
        codes_col = "__ivfpq_code"
    probed = work.filter(F.col(cell_col).isin(probe_cells))
    return pq_adc_topk(
        probed,
        query_vec,
        codebooks,
        k=k,
        id_col=id_col,
        codes_col=codes_col,
        round_dp=round_dp,
        exclude_ids=exclude_ids,
        refine_n=refine_n,
        vectors=df if refine_n > 0 else None,
        vec_col=vec_col,
    )


def _exact_rerank_multi(
    shortlist: DataFrame,
    vectors: DataFrame,
    queries: dict[int, list[float]],
    k: int,
    id_col: str,
    vec_col: str,
    round_dp: int,
) -> DataFrame:
    """Shared two-stage tail for the batched ANN paths: broadcast the
    (query_id, id) shortlist INTO the raw-vector scan, attach each
    query's vector via a broadcast Q-row frame, exact squared-L2
    re-rank per query (ascending rounded l2, ties to the lower id).
    Touches |shortlist| raw vectors total — never the corpus.

    NULL raw vectors are filtered BEFORE scoring (the l2_topk /
    pq_adc_topk isNotNull discipline — ADVICE r13): a NULL ``vec_col``
    in a separate ``vectors`` table would produce NULL l2, which
    Spark's ASC NULLS FIRST would rank ABOVE every real candidate."""
    spark = vectors.sparkSession
    qdf = spark.createDataFrame(
        [(int(qid), [float(x) for x in v]) for qid, v in queries.items()],
        "query_id int, __qv array<double>",
    )
    vcol = F.col(vec_col).cast("array<double>")
    cand = (
        vectors.select(id_col, vec_col)
        .filter(F.col(vec_col).isNotNull())
        .join(F.broadcast(shortlist), id_col)
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id",
            F.col(id_col),
            F.col("adc"),
            F.round(
                F.aggregate(
                    F.zip_with(vcol, F.col("__qv"), lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0),
                    lambda acc, d: acc + d,
                ),
                round_dp,
            ).alias("l2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("l2").asc(), F.col(id_col))
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def ivfpq_topk_multi(
    df: DataFrame,
    queries: dict[int, list[float]],
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str | None = None,
    codes_col: str | None = None,
    round_dp: int = 6,
    exclude_query_ids: bool = True,
    mode: str = "fold",
    coarse_metric: str = "cosine",
    refine_n: int = 0,
    vectors: DataFrame | None = None,
) -> DataFrame:
    """The full serving architecture in one operator: pruning ×
    compression × BATCHING. For a batch of queries, probe cells are
    selected per query driver-side; the store is scanned ONCE over the
    UNION of all probed cells (directory pruning when ``cell_col`` is
    the store's partition column — the scan never even lists
    un-probed cells); each query then scores only the rows inside ITS
    OWN probed cells. Output (query_id, id_col, adc), per-query rows
    identical to ``ivfpq_topk`` (parity-tested).

    Cost shape at 100 TB: one pruned compressed scan of
    |∪ probe cells| / k_cells of the corpus serves the WHOLE request
    batch — overlapping probe sets (the common case: queries cluster
    where the data does) are read once, not once per query.

    ``mode`` is the ``pq_adc_topk_multi`` split: ``"fold"`` = per-query
    literal-LUT branches over the shared pruned scan (oracle-grade
    sequential sums); ``"arrow"`` = ONE mapInPandas pass over the
    union-pruned scan — per Arrow batch the kernel gathers all Q
    distances and masks each query to its own cells, emitting local
    top-k per (task, query), so the global re-rank shuffles
    ≤ partitions × Q × k rows. ``exclude_query_ids`` drops each
    query's own id (corpus-drawn queries).

    ``refine_n`` > 0 enables the standard two-stage search per query
    (output gains the exact ``l2`` column, ordering switches to it):
    each query shortlists refine_n ADC candidates — per-branch width
    is max(k, refine_n), the r12 ADVICE lesson — and ONE broadcast
    join re-ranks all Q shortlists against the raw vectors together
    (``vectors`` defaults to ``df``, the single-query convention;
    pass the raw table when the store is codes-only).
    """
    if not queries:
        raise ValueError("need at least one query")
    if mode not in ("fold", "arrow"):
        raise ValueError(f"mode must be 'fold' or 'arrow', got {mode!r}")
    id_t = _validated_id_type(df, id_col)
    shortlist_k = max(k, refine_n)
    probes = {
        qid: _probe_cells(centroids, q, nprobe, coarse_metric)
        for qid, q in queries.items()
    }
    work = df
    if cell_col is None:
        work = ivf_assign(work, centroids, vec_col, "__ivfpq_cell", coarse_metric)
        cell_col = "__ivfpq_cell"
    if codes_col is None:
        work = pq_encode(work, codebooks, vec_col, "__ivfpq_code", mode="arrow")
        codes_col = "__ivfpq_code"
    union_cells = sorted({c for p in probes.values() for c in p})
    scoped = work.filter(F.col(cell_col).isin(union_cells))
    branch_k = shortlist_k if refine_n > 0 else k
    if mode == "fold":
        out = None
        for qid in sorted(queries):
            branch = pq_adc_topk(
                scoped.filter(F.col(cell_col).isin(probes[qid])),
                queries[qid],
                codebooks,
                k=branch_k,
                id_col=id_col,
                codes_col=codes_col,
                round_dp=round_dp,
                exclude_ids=(qid,) if exclude_query_ids else (),
            ).select(
                F.lit(int(qid)).cast("int").alias("query_id"),
                F.col(id_col),
                F.col("adc"),
            )
            out = branch if out is None else out.unionByName(branch)
        if refine_n <= 0:
            return out
        return _exact_rerank_multi(
            out, vectors if vectors is not None else df,
            queries, k, id_col, vec_col, round_dp,
        )

    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    m = len(codebooks)
    qids = sorted(queries)
    luts = np.asarray(
        [_pq_lut(queries[qid], codebooks) for qid in qids], dtype=np.float64
    )
    probe_sets = [frozenset(probes[qid]) for qid in qids]
    qid_arr = np.asarray(qids, dtype=np.int64)

    def gen(batches):
        for pdf in batches:
            mask = pdf[codes_col].notna() & pdf[cell_col].notna()
            ids = pdf.loc[mask, id_col].to_numpy(dtype=np.int64)
            if not len(ids):
                continue
            cells = pdf.loc[mask, cell_col].to_numpy(dtype=np.int64)
            codes = np.stack(pdf.loc[mask, codes_col].to_numpy()).astype(np.int64)
            adc = np.zeros((len(ids), len(qids)), dtype=np.float64)
            for j in range(m):
                adc += luts[:, j, :][:, codes[:, j]].T
            r = _round_half_up_np(adc, round_dp)
            parts = []
            for qi, qid in enumerate(qid_arr):
                keep = np.isin(cells, list(probe_sets[qi]))
                if exclude_query_ids:
                    keep &= ids != qid
                col = r[keep, qi]
                order = np.lexsort((ids[keep], col))[:branch_k]
                parts.append(
                    pd.DataFrame(
                        {
                            "query_id": np.full(
                                int(order.size), qid, dtype=np.int32
                            ),
                            id_col: ids[keep][order],
                            "adc": col[order],
                        }
                    )
                )
            yield pd.concat(parts, ignore_index=True)

    local = scoped.mapInPandas(gen, schema=f"query_id int, {id_col} {id_t}, adc double")
    w = Window.partitionBy("query_id").orderBy(F.col("adc").asc(), F.col(id_col))
    ranked = (
        local.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= branch_k)
        .drop("__rn")
    )
    if refine_n <= 0:
        return ranked
    return _exact_rerank_multi(
        ranked, vectors if vectors is not None else df,
        queries, k, id_col, vec_col, round_dp,
    )


def residualize(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    cell_col: str | None = None,
    out: str = "residual",
    metric: str = "l2",
) -> DataFrame:
    """Attach each vector's coarse-quantization RESIDUAL
    (x − centroid[cell]) — the preprocessing step of residual IVF-PQ
    (the FAISS ``IVF,PQ`` default): PQ codebooks fit on residuals see
    the small within-cell displacements instead of the whole embedding
    span, which is where the accuracy of that variant comes from.

    The centroid lookup is a BROADCAST JOIN against a k_cells-row frame
    (not a literal array-of-arrays indexed by cell): literal trees are
    the measured fold cliff as k grows, while the coarse tier at real
    scale runs k_cells in the thousands — a tiny broadcast dim stays
    flat there. The subtraction is JVM ``zip_with``. NULL vectors pass
    through with NULL residuals (their cell is NULL → join miss → NULL
    centroid).
    """
    work = df
    if cell_col is None:
        work = ivf_assign(work, centroids, vec_col, "__res_cell", metric)
        cell_col = "__res_cell"
    cents = df.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "__res_cell_key int, __res_cent array<double>",
    )
    vec = F.col(vec_col).cast("array<double>")
    joined = work.join(
        F.broadcast(cents), F.col(cell_col) == F.col("__res_cell_key"), "left"
    )
    return joined.withColumn(
        out, F.zip_with(vec, F.col("__res_cent"), lambda x, y: x - y)
    ).drop("__res_cell_key", "__res_cent")


def ivfpq_residual_topk(
    df: DataFrame,
    query_vec: list[float],
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str | None = None,
    codes_col: str | None = None,
    round_dp: int = 6,
    exclude_ids: tuple[int, ...] = (),
    refine_n: int = 0,
    coarse_metric: str = "l2",
) -> DataFrame:
    """Residual IVF-PQ top-k (the FAISS-default accuracy variant):
    ``codebooks`` must have been fit on RESIDUALS
    (``pq_fit(residualize(df, centroids), vec_col="residual")``), and
    each probed cell gets ITS OWN lookup table computed from
    (query − that cell's centroid) — ADC distances then approximate
    ‖(q − c_cell) − code‖², the within-cell geometry.

    Cost shape vs the global-codebook ``ivfpq_topk``: the scan is the
    SAME (nprobe pruned partitions × m-int codes; per-cell branches are
    unioned TakeOrderedAndProject scans, nprobe of them), the storage
    trade is NOT — residual codes are coupled to the coarse tier, so
    re-clustering means re-encoding the corpus. Accuracy is measured
    against the global variant in SCALING.md ("Round 12: residual vs
    global PQ"). ``refine_n`` re-ranks against raw vectors exactly as
    everywhere else.
    """
    import numpy as np  # noqa: PLC0415

    c = np.asarray(centroids, dtype=np.float64)
    qv = np.asarray(query_vec, dtype=np.float64)
    probe_cells = _probe_cells(centroids, query_vec, nprobe, coarse_metric)
    work = df
    if cell_col is None or codes_col is None:
        if cell_col is None:
            work = ivf_assign(work, centroids, vec_col, "__ivfpq_cell", coarse_metric)
            cell_col = "__ivfpq_cell"
        if codes_col is None:
            work = pq_encode(
                residualize(work, centroids, vec_col, cell_col, "__ivfpq_res"),
                codebooks,
                "__ivfpq_res",
                "__ivfpq_code",
                mode="arrow",
            )
            codes_col = "__ivfpq_code"
    # each per-cell branch must shortlist max(k, refine_n) rows, not k:
    # with per-branch limit k the unioned shortlist tops out at
    # nprobe*k candidates, silently shrinking a refine_n=100/k=10/
    # nprobe=4 re-rank pool to 40 and weakening the two-stage recall
    # contract (ADVICE r12 item 1 — ivfpq_topk avoids this by
    # shortlisting refine_n inside one pq_adc_topk call; here the
    # per-cell LUTs force per-branch scans, so the width goes per
    # branch). Still nprobe tiny k-heaps — no plan-shape change.
    branch_k = max(k, refine_n)
    branches = None
    for cell in probe_cells:
        q_res = [float(x) for x in (qv - c[cell])]
        branch = pq_adc_topk(
            work.filter(F.col(cell_col) == cell),
            q_res,
            codebooks,
            k=branch_k,
            id_col=id_col,
            codes_col=codes_col,
            round_dp=round_dp,
            exclude_ids=exclude_ids,
        )
        branches = branch if branches is None else branches.unionByName(branch)
    merged = branches.orderBy("adc", id_col).limit(k)
    if refine_n <= 0:
        return merged
    # max(k, refine_n), not refine_n: a refine_n < k call must still
    # yield k rows and match the multi path's shortlist width (ADVICE r14)
    shortlist = branches.orderBy("adc", id_col).limit(max(k, refine_n))
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    vcol = F.col(vec_col).cast("array<double>")
    # NULL raw vectors filtered before exact scoring (the r14 refine-leg
    # discipline: NULL l2 sorts ASC NULLS FIRST, above real candidates)
    candidates = df.filter(F.col(vec_col).isNotNull()).join(
        F.broadcast(shortlist), id_col, "inner"
    )
    return (
        candidates.select(
            F.col(id_col),
            F.col("adc"),
            F.round(
                F.aggregate(
                    F.zip_with(vcol, qlit, lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0),
                    lambda acc, d: acc + d,
                ),
                round_dp,
            ).alias("l2"),
        )
        .orderBy("l2", id_col)
        .limit(k)
    )


def ivfpq_residual_topk_multi(
    df: DataFrame,
    queries: dict[int, list[float]],
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str | None = None,
    codes_col: str | None = None,
    round_dp: int = 6,
    exclude_query_ids: bool = True,
    mode: str = "fold",
    coarse_metric: str = "l2",
    refine_n: int = 0,
    vectors: DataFrame | None = None,
) -> DataFrame:
    """Batched serving over a RESIDUAL store — completes the residual
    variant's serving story (VERDICT r13 item 7b): ``codebooks`` must
    have been fit on residuals, so every (query, probed cell) pair gets
    ITS OWN lookup table computed from (query − that cell's centroid),
    and the store is still scanned ONCE over the UNION of all queries'
    probed cells. Output (query_id, id_col, adc), per-query rows
    identical to ``ivfpq_residual_topk`` (parity-tested).

    Cost shape at 100 TB vs the global-codebook ``ivfpq_topk_multi``:
    the pruned scan is the SAME (union of probed cells × m-int codes);
    the LUT metadata grows from Q×m×k_sub to Q×nprobe×m×k_sub — still
    driver-side kilobytes. ``mode`` is the established split:

    - ``"fold"``: one ``pq_adc_topk`` literal-LUT branch per
      (query, probed cell) — Q×nprobe branches over the shared pruned
      scan, each a cell-filtered codegen pass with the oracle-grade
      sequential sums, merged per query by a k-heap window.
    - ``"arrow"``: ONE mapInPandas pass over the union-pruned scan;
      per Arrow batch the kernel scores each query's rows cell-group
      by cell-group with that cell's LUT (sequential j-ordered adds —
      the fold order), emits local top-``branch_k`` per (task, query),
      so the global re-rank shuffles ≤ partitions × Q × branch_k rows.

    ``refine_n`` > 0 re-ranks all Q shortlists (each max(k, refine_n)
    wide — the r12 ADVICE width lesson) against the raw vectors with
    ONE broadcast join (``_exact_rerank_multi``; output gains ``l2``
    and orders by it). ``vectors`` defaults to ``df``.
    """
    import numpy as np  # noqa: PLC0415

    if not queries:
        raise ValueError("need at least one query")
    if mode not in ("fold", "arrow"):
        raise ValueError(f"mode must be 'fold' or 'arrow', got {mode!r}")
    id_t = _validated_id_type(df, id_col)
    c = np.asarray(centroids, dtype=np.float64)
    probes = {
        qid: _probe_cells(centroids, q, nprobe, coarse_metric)
        for qid, q in queries.items()
    }
    work = df
    if cell_col is None:
        work = ivf_assign(work, centroids, vec_col, "__ivfpq_cell", coarse_metric)
        cell_col = "__ivfpq_cell"
    if codes_col is None:
        work = pq_encode(
            residualize(work, centroids, vec_col, cell_col, "__ivfpq_res"),
            codebooks,
            "__ivfpq_res",
            "__ivfpq_code",
            mode="arrow",
        )
        codes_col = "__ivfpq_code"
    union_cells = sorted({cell for p in probes.values() for cell in p})
    scoped = work.filter(F.col(cell_col).isin(union_cells))
    branch_k = max(k, refine_n) if refine_n > 0 else k
    qids = sorted(queries)
    # per-(query, cell) residual LUTs — Q×nprobe×m×k_sub driver floats
    res_luts = {
        qid: {
            cell: _pq_lut(
                [float(x) for x in (np.asarray(queries[qid]) - c[cell])],
                codebooks,
            )
            for cell in probes[qid]
        }
        for qid in qids
    }
    w = Window.partitionBy("query_id").orderBy(F.col("adc").asc(), F.col(id_col))
    if mode == "fold":
        out = None
        for qid in qids:
            for cell in probes[qid]:
                branch = pq_adc_topk(
                    scoped.filter(F.col(cell_col) == cell),
                    # LUT recomputed inside pq_adc_topk from this
                    # residual query — same values as res_luts
                    [float(x) for x in (np.asarray(queries[qid]) - c[cell])],
                    codebooks,
                    k=branch_k,
                    id_col=id_col,
                    codes_col=codes_col,
                    round_dp=round_dp,
                    exclude_ids=(qid,) if exclude_query_ids else (),
                ).select(
                    F.lit(int(qid)).cast("int").alias("query_id"),
                    F.col(id_col),
                    F.col("adc"),
                )
                out = branch if out is None else out.unionByName(branch)
        # refine_n <= 0 ⇒ branch_k == k, so this single window IS the
        # final per-query top-k; with refine it is the shortlist width
        ranked = (
            out.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= branch_k)
            .drop("__rn")
        )
        if refine_n <= 0:
            return ranked
        return _exact_rerank_multi(
            ranked, vectors if vectors is not None else df,
            queries, k, id_col, vec_col, round_dp,
        )

    import pandas as pd  # noqa: PLC0415

    m = len(codebooks)
    lut_arr = {
        qid: {cell: np.asarray(tbl, dtype=np.float64)
              for cell, tbl in res_luts[qid].items()}
        for qid in qids
    }
    probe_sets = [frozenset(probes[qid]) for qid in qids]
    qid_arr = np.asarray(qids, dtype=np.int64)

    def gen(batches):
        for pdf in batches:
            mask = pdf[codes_col].notna() & pdf[cell_col].notna()
            ids = pdf.loc[mask, id_col].to_numpy(dtype=np.int64)
            if not len(ids):
                continue
            cells = pdf.loc[mask, cell_col].to_numpy(dtype=np.int64)
            codes = np.stack(pdf.loc[mask, codes_col].to_numpy()).astype(np.int64)
            parts = []
            for qi, qid in enumerate(qid_arr):
                keep = np.isin(cells, list(probe_sets[qi]))
                if exclude_query_ids:
                    keep &= ids != qid
                if not keep.any():
                    continue
                sub_ids = ids[keep]
                sub_cells = cells[keep]
                sub_codes = codes[keep]
                adc = np.zeros(len(sub_ids), dtype=np.float64)
                for cell, lut in lut_arr[int(qid)].items():
                    cmask = sub_cells == cell
                    if not cmask.any():
                        continue
                    cc = sub_codes[cmask]
                    s = np.zeros(int(cmask.sum()), dtype=np.float64)
                    # sequential j-ordered adds — the fold's IEEE order
                    for j in range(m):
                        s += lut[j][cc[:, j]]
                    adc[cmask] = s
                r = _round_half_up_np(adc, round_dp)
                order = np.lexsort((sub_ids, r))[:branch_k]
                parts.append(
                    pd.DataFrame(
                        {
                            "query_id": np.full(
                                int(order.size), qid, dtype=np.int32
                            ),
                            id_col: sub_ids[order],
                            "adc": r[order],
                        }
                    )
                )
            if parts:
                yield pd.concat(parts, ignore_index=True)

    local = scoped.mapInPandas(gen, schema=f"query_id int, {id_col} {id_t}, adc double")
    ranked = (
        local.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= (k if refine_n <= 0 else branch_k))
        .drop("__rn")
    )
    if refine_n <= 0:
        return ranked
    return _exact_rerank_multi(
        ranked, vectors if vectors is not None else df,
        queries, k, id_col, vec_col, round_dp,
    )
