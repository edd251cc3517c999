#!/usr/bin/env python
"""Hybrid deletion walkthrough (twin of reference examples/test_deletion.rs).

Builds a hybrid index with recent (HNSW) and historical (IVF) vectors,
then demonstrates the full deletion lifecycle: single delete from each
index, batch delete, deleted vectors excluded from search, deletion
stats, manifest-bound deleted ids, and vacuum.

Run from the repo root:  JAX_PLATFORMS=cpu python examples/deletion.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

import time

import numpy as np

from fabstir_vectordb_tpu.index import HybridConfig, HybridIndex
from fabstir_vectordb_tpu.index.ivf import IVFConfig

DIM = 384
NOW = time.time()
DAY = 86_400.0


def main() -> None:
    print("Hybrid deletion walkthrough\n")

    # tiny IVF config like the reference example (4 clusters, seed 42)
    idx = HybridIndex(
        DIM, HybridConfig(ivf=IVFConfig(n_clusters=4, n_probe=4, seed=42),
                          auto_migrate=False))

    print("training index on 100 vectors...")
    rng = np.random.default_rng(42)
    idx.initialize(rng.standard_normal((100, DIM)).astype(np.float32))

    print("inserting 10 recent vectors (routed to HNSW)...")
    recent = rng.standard_normal((10, DIM)).astype(np.float32)
    idx.insert_batch(
        [f"recent_{i}" for i in range(10)], recent,
        np.array([NOW - i * 3600.0 for i in range(10)]), now=NOW)

    print("inserting 10 historical vectors (routed to IVF)...")
    historical = rng.standard_normal((10, DIM)).astype(np.float32)
    idx.insert_batch(
        [f"historical_{i}" for i in range(10)], historical,
        np.array([NOW - (30 + i) * DAY for i in range(10)]), now=NOW)

    s = idx.stats(now=NOW)
    print(f"  -> recent={s.recent_vectors} historical={s.historical_vectors}\n")
    assert (s.recent_vectors, s.historical_vectors) == (10, 10)

    print("deleting recent_3 (HNSW) and historical_7 (IVF)...")
    assert idx.delete("recent_3")
    assert idx.delete("historical_7")
    print("batch-deleting recent_8, historical_1...")
    assert idx.batch_delete(["recent_8", "historical_1"]) == 2

    ds = idx.deletion_stats()
    print(f"  deletion stats: {ds}")
    assert ds["total_deleted"] == 4

    print("searching near recent_3's vector — the deleted id must not appear")
    hits = idx.search(recent[3], 5, now=NOW)
    ids = [vid for vid, _ in hits]
    print(f"  top-5: {ids}")
    assert "recent_3" not in ids

    deleted = sorted(idx.get_deleted_vectors())
    print(f"  manifest deleted_vectors: {deleted}")
    assert deleted == ["historical_1", "historical_7", "recent_3", "recent_8"]

    print("\nvacuuming...")
    removed = idx.vacuum()
    print(f"  vacuum removed: {removed}")
    assert removed["total_removed"] == 4
    assert idx.deletion_stats()["total_deleted"] == 0

    s = idx.stats(now=NOW)
    print(f"  after vacuum: recent={s.recent_vectors} "
          f"historical={s.historical_vectors}")
    assert s.total_vectors == 16

    print("\nOK — deletion lifecycle complete")


if __name__ == "__main__":
    main()
