"""Randomized multi-batch replay of ``streaming_semantic_dedup``
against a pure-Python implementation of its EXACT contract (the r12
greedy form): per batch — SRP signatures on unit vectors, cross-batch
drops against accepted state via (table, sig) bucket collision +
cosine verify, cross-dropped ids anti-joined OUT of the intra pair
graph, then min-id-per-connected-component among the remaining batch
vectors; NULL/corrupt vectors kept but stateless.

The replay reuses the operator's own ``_hyperplanes`` and replicates
its float discipline operation for operation (sequential
sum-of-squares norm, per-element division, numpy sign-bit matmul,
sequential zip-fold dot). Two guard assertions make the comparison
sound rather than lucky: every (vector, plane) dot must sit well away
from zero (a borderline sign bit could legitimately differ between
BLAS batch shapes) and every candidate cosine well away from the
threshold (so the HALF_UP rounding scheme cannot decide a pair).
Deterministic seed — the guards were verified to hold and the test is
exact, not tolerance-based."""

from __future__ import annotations

import math

import numpy as np

from datapipelineetl_spark.streaming import runner

DIM, THRESHOLD, N_PLANES, N_TABLES, SEED = 16, 0.95, 4, 4, 42


def _unit(v):
    n = math.sqrt(sum(x * x for x in v))
    if n == 0.0:
        return [0.0] * len(v)
    return [x / n for x in v]


def _make_sigs(planes_t):
    w = np.array(
        [p for planes in planes_t for p in planes], dtype=np.float64
    ).T

    def sigs(u):
        dots = np.asarray(u, dtype=np.float64) @ w
        assert np.abs(dots).min() > 1e-6, "vector sits on a hyperplane"
        bits = dots >= 0
        return [
            int(sum(1 << p for p in range(N_PLANES) if bits[t * N_PLANES + p]))
            for t in range(N_TABLES)
        ]

    return sigs


def _cos(ua, ub):
    acc = 0.0
    for a, b in zip(ua, ub):
        acc += a * b
    return acc


def _replay(batches, planes_t):
    """Pure-Python replay. Returns (survivor ids, state ids)."""
    sigs_of = _make_sigs(planes_t)
    state = {}  # id -> (unit, sigs), accepted comparable vectors
    survivors = set()
    for batch in batches:
        units, bsigs, comparable = {}, {}, []
        for i, v in batch:
            if v is None or any(x is None for x in v):
                survivors.add(i)  # kept, nothing comparable, no state
                continue
            units[i] = _unit(v)
            bsigs[i] = sigs_of(units[i])
            comparable.append(i)
        cross = set()
        for i in comparable:
            for j, (uj, sj) in state.items():
                if any(bsigs[i][t] == sj[t] for t in range(N_TABLES)):
                    c = _cos(units[i], uj)
                    assert abs(c - THRESHOLD) > 1e-3, "cosine on the boundary"
                    if c >= THRESHOLD:
                        cross.add(i)
                        break
        elig = [i for i in comparable if i not in cross]
        edges = {}
        for ai in range(len(elig)):
            for bi in range(ai + 1, len(elig)):
                a, b = sorted((elig[ai], elig[bi]))
                if any(bsigs[a][t] == bsigs[b][t] for t in range(N_TABLES)):
                    c = _cos(units[a], units[b])
                    assert abs(c - THRESHOLD) > 1e-3, "cosine on the boundary"
                    if c >= THRESHOLD:
                        edges.setdefault(a, set()).add(b)
                        edges.setdefault(b, set()).add(a)
        # connected components -> keep min id
        seen, losers = set(), set()
        for start in elig:
            if start in seen or start not in edges:
                continue
            comp, stack = set(), [start]
            while stack:
                n = stack.pop()
                if n in comp:
                    continue
                comp.add(n)
                stack.extend(edges.get(n, ()))
            seen |= comp
            losers |= comp - {min(comp)}
        accepted = [i for i in comparable if i not in cross and i not in losers]
        survivors.update(accepted)
        for i in accepted:
            state[i] = (units[i], bsigs[i])
    return survivors, set(state)


def _gen_batches(rng):
    """4 batches x ~12 arrivals: fresh concepts, near-dups of earlier
    arrivals (cross- and intra-batch), dup-of-dup chains (the
    transitive case), plus one NULL and one corrupt vector."""
    batches, all_vecs, next_id = [], {}, 0
    for b in range(4):
        batch = []
        for _ in range(12):
            i = next_id
            next_id += 3  # id gaps; arrival order == id order here
            if all_vecs and rng.random() < 0.45:
                src = int(rng.choice(sorted(all_vecs)))
                v = np.asarray(all_vecs[src]) + rng.normal(scale=1e-5, size=DIM)
            else:
                v = rng.normal(size=DIM)
            v = [float(x) for x in v]
            batch.append((i, v))
            all_vecs[i] = v
        batches.append(batch)
    batches[1].append((next_id, None))
    batches[2].append((next_id + 3, [1.0] + [None] * (DIM - 1)))
    return batches


def test_streaming_semantic_dedup_multi_batch_matches_python_replay(spark, tmp_path):
    from datapipelineetl_spark.operators.similarity import _hyperplanes

    rng = np.random.default_rng(SEED)
    batches = _gen_batches(rng)
    planes_t = [
        _hyperplanes(N_PLANES, DIM, SEED + 1000003 * t) for t in range(N_TABLES)
    ]
    want_survivors, want_state = _replay(batches, planes_t)

    schema = "vec_id long, embedding array<double>"
    src, state, out, ck = (str(tmp_path / d) for d in
                           ("src", "state", "out", "ck"))
    for b, batch in enumerate(batches):
        spark.createDataFrame(batch, schema).coalesce(1).write.mode(
            "append" if b else "overwrite").parquet(src)
        stream = spark.readStream.schema(schema).parquet(src)
        runner.streaming_semantic_dedup(
            stream, state, out, ck, dim=DIM, threshold=THRESHOLD,
            num_planes=N_PLANES, num_tables=N_TABLES, seed=SEED,
        )

    got = {r.vec_id for r in spark.read.parquet(out).collect()}
    assert got == want_survivors
    got_state = {r.vec_id for r in spark.read.parquet(state + "/vecs").collect()}
    assert got_state == want_state
    # the generator must actually have exercised the interesting paths
    all_ids = {i for batch in batches for i, _ in batch}
    assert len(all_ids - got) >= 5          # real drops happened
    assert want_state < want_survivors      # NULL/corrupt kept, stateless
