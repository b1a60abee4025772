"""Data-layout optimization for 100 TB parquet stores: Z-order writes.

Partitioning prunes on ONE column hierarchy; Z-ordering makes file- and
row-group-level min/max statistics selective on SEVERAL columns at once:
rows are sorted by the bit-interleaving of the columns' rank codes, so
each written file covers a small hyper-rectangle of the value space and a
predicate on ANY of the z-columns skips most files (parquet readers prune
row groups whose min/max exclude the filter; engines with file-level
stats — or a manifest built from ``pyarrow`` footer metadata — skip whole
files). This is the same design as Delta/Iceberg OPTIMIZE ZORDER BY,
expressed as a plain write-time transform.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_ZBITS = 16  # rank resolution per column; 2 cols × 16 bits → 32-bit z-value


def z_value(rank_cols: Sequence[Column]) -> Column:
    """Bit-interleave per-column integer rank codes (each in
    [0, 2^16)) into one Z/Morton value — the space-filling-curve key.
    Pure integer shift/mask expressions: codegen, no UDF."""
    z: Column = F.lit(0).cast("long")
    n = len(rank_cols)
    for c_idx, col in enumerate(rank_cols):
        for bit in range(_ZBITS):
            z = z + (
                F.shiftleft(
                    F.shiftright(col.cast("long"), bit).bitwiseAND(F.lit(1)),
                    bit * n + c_idx,
                )
            )
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int = 8,
) -> None:
    """Write ``df`` as ``n_files`` parquet files Z-ordered on ``cols``:
    each column is rank-coded to 16 bits (percent_rank — value-
    distribution-proof, so skewed columns still spread over the code
    space), ranks interleave into a z-value, and a range-repartition +
    in-partition sort on it clusters each output file on a hyper-
    rectangle of the value space.

    Scale: two window passes for the rank codes (one shuffle each at
    most — at 100 TB swap percent_rank for a cheap quantile-map from
    ``approx_percentile`` on a sample, same code space, no global
    window), then ONE range shuffle for the write. The payoff is on the
    READ side forever after: min/max stats per file/row-group become
    selective on every z-column (``tests/test_layout.py`` measures it
    from the actual parquet footers).
    """
    if not cols or len(cols) > 3:
        raise ValueError(f"z-order 1–3 columns, got {list(cols)}")
    ranks = []
    for c in cols:
        w = Window.orderBy(F.col(c))
        ranks.append(
            F.floor(F.percent_rank().over(w) * ((1 << _ZBITS) - 1)).cast("long")
        )
    zed = df.withColumn("__z", z_value(ranks))
    (
        zed.repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_stats(path: str, cols: Sequence[str]) -> list[dict]:
    """Per-file min/max for ``cols`` from the parquet footers (pyarrow) —
    the manifest a file-skipping reader would consult. Returns one dict
    per data file: {file, col: (min, max), ...}."""
    from pathlib import Path as _P

    import pyarrow.parquet as pq

    out = []
    for f in sorted(_P(path).glob("*.parquet")):
        md = pq.ParquetFile(str(f)).metadata
        stats: dict = {"file": f.name}
        for c in cols:
            mn, mx = None, None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    if col.path_in_schema == c and col.statistics is not None:
                        s = col.statistics
                        mn = s.min if mn is None else min(mn, s.min)
                        mx = s.max if mx is None else max(mx, s.max)
            stats[c] = (mn, mx)
        out.append(stats)
    return out
