"""Profile the pruned-regime serving kernels component by component.

Builds a hybrid index (recent -> HNSW, rest -> IVF), then times on device:
flat exact scan, greedy descent, layer-0 beam, IVF nprobe scan, and the
full fused hybrid kernel — each at several batch sizes. Separates dispatch
count and compile from steady-state so the pruned path's cost structure
(sequential beam iterations vs gather-bound list scans) is visible.

Usage: python scripts/profile_pruned.py --n 200000 --recent 10000
"""
from __future__ import annotations

import argparse
import time

import numpy as np

NOW = 1_700_000_000.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--recent", type=int, default=10_000)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--clusters", type=int, default=256)
    ap.add_argument("--ef", type=int, default=64)
    ap.add_argument("--n-probe", type=int, default=16)
    ap.add_argument("--batches", type=int, nargs="*", default=[1, 128])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fabstir_vectordb_tpu.index.fused import (
        flat_search_kernel, hybrid_search_kernel)
    from fabstir_vectordb_tpu.index.hnsw import (
        beam_search_kernel, greedy_descent_kernel)
    from fabstir_vectordb_tpu.index.hybrid import HybridConfig, HybridIndex
    from fabstir_vectordb_tpu.index.ivf import IVFConfig, ivf_search_kernel
    from fabstir_vectordb_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    print(f"devices: {jax.devices()}", flush=True)

    rng = np.random.default_rng(0)
    centers = rng.standard_normal((args.clusters, args.dim)).astype(np.float32)
    vecs = (centers[rng.integers(0, args.clusters, args.n)]
            + 0.3 * rng.standard_normal((args.n, args.dim)).astype(np.float32))
    ts = np.full(args.n, NOW - 100_000.0)
    ts[: args.recent] = NOW - 10.0

    cfg = HybridConfig(recent_threshold_secs=86_400.0,
                       ivf=IVFConfig(n_clusters=args.clusters))
    idx = HybridIndex(args.dim, cfg)
    idx.initialize(vecs[rng.choice(args.n, 50_000, replace=False)])
    t0 = time.perf_counter()
    idx.insert_batch([f"v{i}" for i in range(args.n)], vecs, ts, now=NOW)
    print(f"build: {time.perf_counter()-t0:.1f}s", flush=True)

    dev = idx.fused._device_state()
    k = 10

    def timeit(label, fn, reps=20):
        out = fn()  # compile
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps * 1000.0
        print(f"  {label:36s} {dt:9.2f} ms", flush=True)
        return dt

    for b in args.batches:
        q = jnp.asarray(vecs[rng.integers(0, args.n, b)])
        print(f"batch={b}:", flush=True)
        timeit("flat exact scan", lambda: flat_search_kernel(
            dev["x"], dev["x_sq"], dev["members"], q, k))
        stop = jnp.zeros((b,), jnp.int32)
        timeit("greedy descent", lambda: greedy_descent_kernel(
            dev["x"], dev["x_sq"], dev["hnsw_mask"], dev["nbrs_up"],
            dev["up_offset"], q, dev["entry"], dev["entry_level"], stop))
        cur, _ = greedy_descent_kernel(
            dev["x"], dev["x_sq"], dev["hnsw_mask"], dev["nbrs_up"],
            dev["up_offset"], q, dev["entry"], dev["entry_level"], stop)
        starts = cur[:, None]
        act = jnp.ones((b,), bool)
        timeit(f"layer-0 beam ef={args.ef}", lambda: beam_search_kernel(
            dev["x"], dev["x_sq"], dev["hnsw_mask"], dev["nbrs0"],
            dev["nbrs_up"], dev["up_offset"], q, starts, act,
            layer=0, ef=args.ef, max_iters=args.ef + 32))
        timeit(f"ivf scan n_probe={args.n_probe}", lambda: ivf_search_kernel(
            dev["x"], dev["x_sq"], dev["ivf_mask"], dev["centroids"],
            dev["tiles"], q, k, args.n_probe))
        timeit("fused hybrid kernel", lambda: hybrid_search_kernel(
            dev["x"], dev["x_sq"], dev["hnsw_mask"], dev["ivf_mask"],
            dev["ones"], dev["nbrs0"], dev["nbrs_up"], dev["up_offset"],
            dev["entry"], dev["entry_level"], dev["centroids"], dev["tiles"],
            q, k, args.ef, args.n_probe, True, True))


if __name__ == "__main__":
    main()
