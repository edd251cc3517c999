"""Headline benchmark: warm-cache search latency at 100K x 384-dim, k=10.

Reference baseline: 58 ms warm-cache search at 100K x 384, k=10
(BASELINE.md; reference README.md:26, docs/PERFORMANCE_TUNING.md:146,594).

Builds the production-shaped hybrid index (10% recent -> HNSW graph, 90%
historical -> IVF with 256 clusters / n_probe 16), then measures single-query
end-to-end latency through the engine's host+device path (the same path the
session SDK serves), reporting p50 over repeated queries.

Prints ONE JSON line:
  {"metric": ..., "value": p50_ms, "unit": "ms", "vs_baseline": 58/p50}
vs_baseline > 1 means faster than the reference. Extra metrics go to stderr.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_MS = 58.0
NOW = 1_700_000_000.0
DAY = 86_400.0


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    n = int(os.environ.get("FVDB_BENCH_N", 100_000))
    dim = int(os.environ.get("FVDB_BENCH_DIM", 384))
    k = int(os.environ.get("FVDB_BENCH_K", 10))
    n_queries = int(os.environ.get("FVDB_BENCH_QUERIES", 200))

    import jax

    from fabstir_vectordb_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from fabstir_vectordb_tpu.index import (
        FlatIndex,
        HybridConfig,
        HybridIndex,
        IVFConfig,
        SearchConfig,
    )
    from fabstir_vectordb_tpu.index.flat import recall_at_k

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)

    t0 = time.perf_counter()
    # clustered data (mixture of gaussians) ~ realistic embedding geometry;
    # pure uniform noise has no cluster structure for IVF to exploit
    n_centers = 1024
    centers = rng.standard_normal((n_centers, dim)).astype(np.float32)
    assign = rng.integers(0, n_centers, n)
    vecs = centers[assign] + 0.35 * rng.standard_normal((n, dim)).astype(np.float32)
    log(f"data generated: {n}x{dim} ({n_centers} clusters) in {time.perf_counter()-t0:.1f}s")

    idx = HybridIndex(
        dim,
        HybridConfig(
            ivf=IVFConfig(n_clusters=256, n_probe=16, train_size=10_000, seed=0),
            auto_migrate=False,
        ),
    )
    t0 = time.perf_counter()
    idx.initialize(vecs[:10_000])
    log(f"IVF trained (256 clusters) in {time.perf_counter()-t0:.1f}s")

    n_recent = n // 10
    ids = [f"v{i}" for i in range(n)]
    ts = np.full(n, NOW - 30 * DAY)
    ts[:n_recent] = NOW - DAY
    t0 = time.perf_counter()
    idx.insert_batch(ids, vecs, ts, now=NOW)
    build_s = time.perf_counter() - t0
    log(f"insert+build ({n_recent} HNSW / {n - n_recent} IVF) in {build_s:.1f}s")

    cfg = SearchConfig(auto_migrate=False)
    # realistic queries: near the data manifold (the reference benches MiniLM
    # embeddings, where queries resemble stored vectors)
    seeds = rng.integers(0, n, n_queries)
    queries = vecs[seeds] + 0.1 * rng.standard_normal(
        (n_queries, dim)
    ).astype(np.float32)

    # warm-up: compile + device caches
    t0 = time.perf_counter()
    idx.search_rows(queries[0], k, config=cfg, now=NOW)
    cold_ms = (time.perf_counter() - t0) * 1000.0
    log(f"cold first search (incl. compile): {cold_ms:.1f} ms")
    for i in range(3):
        idx.search_rows(queries[i], k, config=cfg, now=NOW)

    lats = []
    for i in range(n_queries):
        t0 = time.perf_counter()
        idx.search_rows(queries[i], k, config=cfg, now=NOW)
        lats.append((time.perf_counter() - t0) * 1000.0)
    lats.sort()
    p50 = lats[len(lats) // 2]
    p99 = lats[int(len(lats) * 0.99)]
    log(f"warm search: p50={p50:.3f} ms p99={p99:.3f} ms avg={np.mean(lats):.3f} ms")

    # recall sanity vs exact oracle (reported to stderr)
    sample = queries[:32]
    _, rows = idx.search_rows(sample, k, config=cfg, now=NOW)
    oracle = FlatIndex(idx.store)
    rec = recall_at_k(oracle, rows, sample, k)
    log(f"recall@{k} vs exact: {rec:.3f}")

    # batched throughput (QPS) at batch=128 (stderr, informational)
    bq = rng.standard_normal((128, dim)).astype(np.float32)
    idx.search_rows(bq, k, config=cfg, now=NOW)  # compile
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        idx.search_rows(bq, k, config=cfg, now=NOW)
    qps = 128 * reps / (time.perf_counter() - t0)
    log(f"batched throughput: {qps:,.0f} QPS (batch=128)")

    print(
        json.dumps(
            {
                "metric": f"warm_search_p50_{n//1000}k_{dim}d_k{k}",
                "value": round(p50, 3),
                "unit": "ms",
                "vs_baseline": round(BASELINE_MS / p50, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
