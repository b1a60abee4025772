"""Binary token-shard sink — the last hop of the text→tensor path:
packed token-id sequences (``corpus.pack_sequences`` output, routed
through ``corpus.shuffle_corpus`` for loader addresses) land as raw
little-endian binary shard files + JSON indexes, the memory-mappable
artifact a training data loader consumes directly (no parquet decode in
the inner loop).

Layout per shard ``s``::

    <dir>/shard-00042.bin       token ids, little-endian int32/int64,
                                sequences concatenated in pos order
    <dir>/shard-00042.idx.json  {"shard": 42, "dtype": "int32",
                                 "sequences": [{"pos": 1, "offset": 0,
                                                "n_tokens": 512}, ...]}

Scale: ONE ``applyInPandas`` over groupBy(shard) — each shard is
assembled and written by one task (exactly the file-sized-shard layout
``shuffle_corpus`` docstrings prescribe), ids never reach the driver.
Writes are tmp-file + atomic rename, so a replayed task overwrites its
own shard instead of corrupting or duplicating it (the same
idempotence contract as the parquet epoch sinks). Executor-local
``open()`` means the directory must be shared storage in a real
cluster (NFS/FUSE-mounted object store) — the standard deployment for
loader-consumed artifacts.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

_DTYPES = {"int32": ("<i4", 1 << 31), "int64": ("<i8", 1 << 63)}


def write_token_shards(
    df: DataFrame,
    out_dir: str,
    shard_col: str = "shard",
    pos_col: str = "pos",
    ids_col: str = "token_ids",
    dtype: str = "int32",
) -> DataFrame:
    """Write ``(shard, pos, token_ids)`` rows as binary shard files;
    returns the manifest (shard, n_sequences, n_tokens, path) — a tiny
    frame to persist next to the artifact. Ids exceeding ``dtype``'s
    range fail the task loudly (a silently wrapped token id is corrupt
    training data).
    """
    if dtype not in _DTYPES:
        raise ValueError(f"dtype must be one of {sorted(_DTYPES)}, got {dtype}")
    np_dtype, bound = _DTYPES[dtype]
    os.makedirs(out_dir, exist_ok=True)

    def kernel(pdf):
        import numpy as np  # noqa: PLC0415 — executor-side import
        import pandas as pd  # noqa: PLC0415

        # the driver-side makedirs above covers local mode; on a cluster
        # the EXECUTOR touches the shared-fs dir, so repeat (idempotent)
        os.makedirs(out_dir, exist_ok=True)
        pdf = pdf.sort_values(pos_col)
        shard = int(pdf[shard_col].iloc[0])
        seqs, offset = [], 0
        chunks = []
        for pos, ids in zip(pdf[pos_col], pdf[ids_col]):
            arr = np.asarray(ids if ids is not None else [], dtype="int64")
            if arr.size and (arr.min() < -bound or arr.max() >= bound):
                raise ValueError(
                    f"token id out of {dtype} range in shard {shard} pos {pos}"
                )
            chunks.append(arr.astype(np_dtype))
            seqs.append(
                {"pos": int(pos), "offset": offset, "n_tokens": int(arr.size)}
            )
            offset += int(arr.size)
        path = os.path.join(out_dir, f"shard-{shard:05d}.bin")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            for c in chunks:
                f.write(c.tobytes())
        os.replace(tmp, path)  # atomic: replays overwrite, never corrupt
        idx = path[: -len(".bin")] + ".idx.json"
        tmp_idx = idx + ".tmp"
        with open(tmp_idx, "w") as f:
            json.dump({"shard": shard, "dtype": dtype, "sequences": seqs}, f)
        os.replace(tmp_idx, idx)
        return pd.DataFrame(
            {
                "shard": [shard],
                "n_sequences": [len(seqs)],
                "n_tokens": [offset],
                "path": [path],
            }
        )

    return (
        df.select(shard_col, pos_col, ids_col)
        .groupBy(shard_col)
        .applyInPandas(
            kernel, "shard int, n_sequences long, n_tokens long, path string"
        )
    )
