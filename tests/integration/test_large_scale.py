"""Large-dataset chunked persistence tests.

Parity with the reference's scale suite (reference:
tests/integration/large_dataset_tests.rs — 100K/500K/1M x 384-dim,
chunk-count verification 100K->10 / 500K->50 / 1M->100, setup that bypasses
slow graph construction, :41-130,:145-419). The HNSW tier is kept tiny
(graph build is the slow part there too); the IVF tier takes the bulk via
vectorized assignment.

The 100K case always runs; 500K/1M are gated behind FVDB_SCALE_TESTS=1
(the reference gates these behind #[ignore], run by scripts/monitor_memory.sh).
"""
import os

import numpy as np
import pytest

from fabstir_vectordb_tpu.core import MemoryObjectStore
from fabstir_vectordb_tpu.index import (
    FlatIndex,
    HybridConfig,
    HybridIndex,
    IVFConfig,
    SearchConfig,
)
from fabstir_vectordb_tpu.storage.persistence import HybridPersister

NOW = 1_700_000_000.0
DAY = 86_400.0
DIM = 384
CHUNK = 10_000

SCALE = os.environ.get("FVDB_SCALE_TESTS") == "1"


def _build(n: int, n_recent: int = 256, dim: int = DIM) -> HybridIndex:
    rng = np.random.default_rng(7)
    # block-generate to bound peak temp memory
    vecs = np.empty((n, dim), np.float32)
    for lo in range(0, n, 100_000):
        hi = min(lo + 100_000, n)
        vecs[lo:hi] = rng.standard_normal((hi - lo, dim), dtype=np.float32)
    idx = HybridIndex(
        dim,
        HybridConfig(
            ivf=IVFConfig(n_clusters=64, n_probe=8, train_size=4_096,
                          max_iterations=8, seed=0),
            auto_migrate=False,
        ),
    )
    idx.initialize(vecs[:4_096])
    ts = np.full(n, NOW - 30 * DAY)
    ts[:n_recent] = NOW - DAY
    idx.insert_batch([f"v{i}" for i in range(n)], vecs, ts, now=NOW)
    return idx


def _roundtrip(n: int):
    idx = _build(n)
    store = MemoryObjectStore()
    persister = HybridPersister(store)
    manifest = persister.save_index_chunked(idx, "big")

    want_chunks = (n + CHUNK - 1) // CHUNK
    assert len(manifest.chunks) == want_chunks
    assert manifest.total_vectors == n
    assert sum(c.vector_count for c in manifest.chunks) == n

    loaded, loaded_manifest = persister.load_index_chunked("big")
    assert loaded_manifest.total_vectors == n
    assert loaded.stats(now=NOW).total_vectors == n

    # search correctness after reload: perturbed stored vectors come back
    q = idx.store.data[:8] + 0.001
    d, rows = loaded.search_rows(q, 5, config=SearchConfig(auto_migrate=False),
                                 now=NOW)
    oracle = FlatIndex(loaded.store)
    _, want = oracle.search_rows(q, 5)
    assert (rows[:, 0] == want[:, 0]).all()

    # recall@10 vs exact oracle (reference: large_dataset_tests.rs verifies
    # search quality at scale)
    from fabstir_vectordb_tpu.index.flat import recall_at_k

    rng = np.random.default_rng(3)
    queries = idx.store.data[rng.integers(0, n, 32)] + 0.01 * rng.standard_normal(
        (32, idx.store.dim)
    ).astype(np.float32)
    _, rows10 = loaded.search_rows(
        queries, 10, config=SearchConfig(auto_migrate=False), now=NOW
    )
    rec = recall_at_k(oracle, rows10, queries, 10)
    assert rec >= 0.99, f"recall@10 at {n}: {rec:.3f}"
    return manifest


def test_100k_chunked_roundtrip():
    manifest = _roundtrip(100_000)
    assert len(manifest.chunks) == 10  # reference: 100K -> 10 chunks (:172)


@pytest.mark.skipif(not SCALE, reason="FVDB_SCALE_TESTS=1 to enable")
def test_500k_chunked_roundtrip():
    manifest = _roundtrip(500_000)
    assert len(manifest.chunks) == 50


@pytest.mark.skipif(not SCALE, reason="FVDB_SCALE_TESTS=1 to enable")
def test_1m_chunked_roundtrip():
    manifest = _roundtrip(1_000_000)
    assert len(manifest.chunks) == 100  # reference: 1M -> 100 chunks (:361)
