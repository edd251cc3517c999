"""Shared size thresholds.

FLAT_THRESHOLD: max (padded) corpus rows for which one exact masked
distance matmul is the fastest query/candidate plan on a single chip.
Measured on a v5e at 384-dim: the flat matmul runs in sub-ms to few-ms
device time up to millions of rows, while gather-based graph/IVF traversal
costs ~4-5 ms/query — matmuls beat gathers until HBM capacity, not compute,
becomes the limit (~6 GB of vectors at the default). Both the fused
serving path and HNSW construction switch plans on this value.
"""
from __future__ import annotations

import os

FLAT_THRESHOLD = int(os.environ.get("FVDB_FLAT_THRESHOLD", 4_194_304))


def serving_dtype() -> str:
    """Device-resident corpus dtype ("float32" | "bfloat16").

    Single source of truth for every ``VectorStore.device()`` consumer —
    serving, HNSW linking, IVF scan and the sharded paths share ONE mirror;
    mixing dtypes across call sites would thrash multi-GB re-uploads through
    the host↔device link (and transiently double HBM residency at scale).
    Read per call so tests/benchmarks can flip regimes at runtime.
    """
    return os.environ.get("FVDB_SERVING_DTYPE", "float32")
