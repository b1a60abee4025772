"""Property-based checks for the sketch family: the Spark sketches
must match bit-for-bit a sequential pure-Python (hashlib) reference on
randomized corpora — counters, registers, and estimates, not tolerance
bands — and merging partials over any random split must equal the
whole-corpus build (the streaming-state contract)."""

from __future__ import annotations

import hashlib
import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from datapipelineetl_spark.operators import sketch

# small alphabet → real collisions in buckets/registers
_word = st.sampled_from(
    ["ant", "bee", "cat", "dog", "elk", "fox", "gnu", "hen", "owl", "pig"]
)
_doc = st.lists(_word, min_size=0, max_size=12).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=12)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _tokens(text: str) -> list[str]:
    return [t for t in text.lower().split() if t]


@settings(max_examples=8, deadline=None)
@given(_corpus)
def test_countmin_matches_python_reference(spark, texts):
    depth, width = 3, 16
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in sketch.countmin_sketch(df, depth=depth, width=width).collect()
    }
    expect: dict = {}
    for t in texts:
        for tok in _tokens(t):
            for i in range(depth):
                cell = (i, _h60(f"{i}:{tok}") % width)
                expect[cell] = expect.get(cell, 0) + 1
    assert got == expect


@settings(max_examples=8, deadline=None)
@given(_corpus, st.integers(min_value=0, max_value=11))
def test_hll_matches_python_reference_and_split_merge(spark, texts, cut):
    m, b = 16, 4
    w = 60 - b
    df = spark.createDataFrame([("g", t) for t in texts], ["source", "text"])

    # python reference registers + estimator
    regs: dict = {}
    for t in texts:
        for tok in _tokens(t):
            h = _h60(tok)
            bucket, suffix = h % m, h >> b
            rho = (w + 1) if suffix == 0 else (w + 1 - suffix.bit_length())
            regs[bucket] = max(regs.get(bucket, 0), rho)
    got_regs = {
        r["__bucket"]: r["__reg"]
        for r in sketch.hll_registers(df, "source", "text", m=m).collect()
    }
    assert got_regs == regs

    if regs:
        num = sum(1 << (w + 1 - r) for r in regs.values())
        harm = num / float(2 ** (w + 1)) + (m - len(regs))
        alpha = 0.7213 / (1 + 1.079 / m)
        raw = alpha * m * m / harm
        v = m - len(regs)
        est = m * math.log(m / v) if (raw <= 2.5 * m and v > 0) else raw
        [row] = sketch.hll_distinct(df, "source", "text", m=m).collect()
        assert row.hll_estimate == round(est, 2)
        assert row.n_empty_buckets == v

    # split-merge == whole (the streaming_sketch_state fold contract)
    left = spark.createDataFrame(
        [("g", t) for t in texts[:cut]] or [("g", "")], ["source", "text"]
    )
    right = spark.createDataFrame(
        [("g", t) for t in texts[cut:]] or [("g", "")], ["source", "text"]
    )
    partials = sketch.hll_registers(left, m=m).unionAll(
        sketch.hll_registers(right, m=m)
    )
    merged = partials.groupBy("source", "__bucket").agg(
        F.max("__reg").alias("__reg")
    )
    got_merged = {
        r["__bucket"]: r["__reg"] for r in merged.collect()
    }
    assert got_merged == regs or (not regs and got_merged == {})


@settings(max_examples=6, deadline=None)
@given(_corpus)
def test_bloom_bitset_matches_python_reference(spark, texts):
    """The bitset holds exactly the python-computed md5-slice positions
    of every distinct 3-gram (hex_width=4, k=2)."""
    import numpy as np

    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    bits = sketch.build_bloom_bitset(df, n=3, k=2, hex_width=4)
    got = {int(p) for p in np.nonzero(np.unpackbits(bits, bitorder="little"))[0]}

    expect: set = set()
    for t in texts:
        toks = _tokens(t)
        grams = {
            " ".join(toks[i : i + 3])
            for i in range(max(len(toks) - 3, 0) + 1)
        }
        for g in grams:
            hx = hashlib.md5(g.encode()).hexdigest()
            expect |= {int(hx[0:4], 16), int(hx[4:8], 16)}
    assert got == expect


@settings(max_examples=8, deadline=None)
@given(_corpus, st.lists(_word, min_size=1, max_size=6, unique=True))
def test_countmin_estimate_matches_python_grid(spark, texts, probes):
    """The ESTIMATE path (VERDICT r11 item 7b): for randomized corpora
    and probe sets — including tokens absent from the corpus — Spark's
    countmin_estimate must equal min-over-depth of the pure-Python
    grid exactly, and never undershoot the true count (the count-min
    upper-bound invariant)."""
    depth, width = 3, 16
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    sk = sketch.countmin_sketch(df, depth=depth, width=width)
    pdf = spark.createDataFrame([(p,) for p in probes], ["token"])
    got = {
        r["token"]: r["cm_count"]
        for r in sketch.countmin_estimate(
            sk, pdf, depth=depth, width=width).collect()
    }

    grid: dict = {}
    true: dict = {}
    for t in texts:
        for tok in _tokens(t):
            true[tok] = true.get(tok, 0) + 1
            for i in range(depth):
                cell = (i, _h60(f"{i}:{tok}") % width)
                grid[cell] = grid.get(cell, 0) + 1
    expect = {
        p: min(grid.get((i, _h60(f"{i}:{p}") % width), 0) for i in range(depth))
        for p in probes
    }
    assert got == expect
    assert all(got[p] >= true.get(p, 0) for p in probes)
