"""Pallas fused flat-scan vs XLA flat kernel on the real TPU (verdict item:
wire the Pallas kernel into serving if it wins, else record numbers and cut).

Also compile-checks the round-2 kernels (heuristic_kept_kernel, bitmap-free
beam) on the device. Run exclusively: no other python process may touch the
TPU while this runs.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

from fabstir_vectordb_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from fabstir_vectordb_tpu.index.fused import flat_search_kernel

try:
    # round-1 kernel; deleted after losing to XLA (docs/PERFORMANCE.md).
    # Restore from git history (tag: pre-pallas-removal) to re-measure.
    from fabstir_vectordb_tpu.ops.pallas.flat_scan import pallas_l2_topk
except ImportError:
    pallas_l2_topk = None


def log(m):
    print(m, file=sys.stderr, flush=True)


def timeit(fn, reps=20):
    fn()  # compile + warm
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1000.0


def main():
    log(f"devices: {jax.devices()}")
    n, dim, k = 1 << 20, 384, 16
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, dim), jnp.float32)
    x_sq = jnp.sum(x * x, axis=1)
    mask = jnp.ones((n,), bool)
    jax.block_until_ready((x, x_sq))
    log(f"corpus resident: {n}x{dim} f32 ({n*dim*4/2**30:.2f} GiB)")

    for b in (1, 8, 128):
        q = jax.random.normal(jax.random.PRNGKey(b), (b, dim), jnp.float32)
        jax.block_until_ready(q)

        t0 = time.perf_counter()
        xla_ms = timeit(lambda: flat_search_kernel(x, x_sq, mask, q, k))
        log(f"B={b:4d} XLA flat:    {xla_ms:8.3f} ms/call "
            f"(setup {time.perf_counter()-t0:.1f}s)")

        for tile in (1024, 4096) if pallas_l2_topk else ():
            try:
                t0 = time.perf_counter()
                pal_ms = timeit(
                    lambda: pallas_l2_topk(x, x_sq, mask, q, k, tile=tile)
                )
                log(f"B={b:4d} pallas t={tile}: {pal_ms:8.3f} ms/call "
                    f"(setup {time.perf_counter()-t0:.1f}s) "
                    f"{'WIN' if pal_ms < xla_ms else 'lose'} "
                    f"({xla_ms/pal_ms:.2f}x)")
            except Exception as e:  # noqa: BLE001
                log(f"B={b:4d} pallas t={tile}: FAILED {type(e).__name__}: "
                    f"{str(e)[:200]}")

        # agreement check at this batch
        vx, rx = jax.device_get(flat_search_kernel(x, x_sq, mask, q, k))
        try:
            if pallas_l2_topk is None:
                raise ImportError
            vp, rp = jax.device_get(pallas_l2_topk(x, x_sq, mask, q, k))
            agree = (rx[:, :8] == rp[:, :8]).mean()
            log(f"B={b:4d} top-8 row agreement XLA vs pallas: {agree:.3f}")
        except Exception:
            pass

    # ---- round-2 kernels compile-check on device ----
    from fabstir_vectordb_tpu.index.hnsw import (
        beam_search_kernel, heuristic_kept_kernel,
    )

    cap = 1 << 16
    xg = x[:cap]
    xg_sq = x_sq[:cap]
    nbrs0 = jax.random.randint(jax.random.PRNGKey(2), (cap, 32), 0, cap,
                               jnp.int32)
    nbrs_up = jnp.full((64, 16), -1, jnp.int32)
    up_off = jnp.full((cap,), -1, jnp.int32)
    q = jax.random.normal(jax.random.PRNGKey(3), (128, dim), jnp.float32)
    t0 = time.perf_counter()
    d, r = beam_search_kernel(
        xg, xg_sq, jnp.ones((cap,), bool), nbrs0, nbrs_up, up_off,
        q, jnp.zeros((128, 1), jnp.int32), jnp.ones((128,), bool),
        layer=0, ef=64, max_iters=96,
    )
    jax.block_until_ready((d, r))
    log(f"bitmap-free beam (B=128, ef=64, cap=64K): compiled+ran in "
        f"{time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    for _ in range(5):
        d, r = beam_search_kernel(
            xg, xg_sq, jnp.ones((cap,), bool), nbrs0, nbrs_up, up_off,
            q, jnp.zeros((128, 1), jnp.int32), jnp.ones((128,), bool),
            layer=0, ef=64, max_iters=96,
        )
    jax.block_until_ready((d, r))
    log(f"beam steady: {(time.perf_counter()-t0)/5*1000:.1f} ms/call")

    cand_d, cand_i = flat_search_kernel(xg, xg_sq, jnp.ones((cap,), bool), q, 128)
    t0 = time.perf_counter()
    kept = heuristic_kept_kernel(xg, cand_i, cand_d, 32)
    jax.block_until_ready(kept)
    log(f"heuristic_kept (B=128, C=128): compiled+ran in "
        f"{time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    for _ in range(5):
        kept = heuristic_kept_kernel(xg, cand_i, cand_d, 32)
    jax.block_until_ready(kept)
    log(f"heuristic steady: {(time.perf_counter()-t0)/5*1000:.1f} ms/call")


if __name__ == "__main__":
    main()
