"""Beyond-flat-threshold scale proof: 5M x 384 served by the pruned path.

The flat exact-matmul plan wins while the (padded) corpus fits
FVDB_FLAT_THRESHOLD rows (default 4,194,304). This script builds a corpus
that genuinely exceeds that threshold — 5M rows pad to an 8,388,608-row
store — so the fused server dispatches ``hybrid_search_kernel`` (HNSW greedy
descent + layer-0 beam over the recent tier, IVF nprobe scan over the
historical tier, global top-k merge) with a bf16-resident corpus mirror
(f32 would need 12.9 GB of HBM for vectors alone; bf16 halves it).

Reference framing: the reference's largest published artifact is a 1M-row
chunk-count test (reference tests/integration/large_dataset_tests.rs:361);
it publishes no >1M serving numbers. This run measures recall@10 (vs exact
f32 ground truth computed host-side), warm p50/p99, and batched QPS in the
regime the graph/IVF engines exist for.

Usage:  FVDB_SERVING_DTYPE=bfloat16 python scripts/scale_beyond_flat.py
          [--n 5000000] [--recent 0.02] [--queries 100]
Emits a markdown table on stdout, JSON lines on stderr.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("FVDB_SERVING_DTYPE", "bfloat16")

import argparse
import json
import time

import numpy as np

NOW = 1_700_000_000.0
DAY = 86_400.0


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def host_ground_truth(data, count, queries, k, chunk=262_144):
    """Exact f32 top-k on host, chunked (bounded RAM, BLAS matmuls)."""
    b = queries.shape[0]
    q_sq = (queries.astype(np.float32) ** 2).sum(1)
    best_d = np.full((b, k), np.inf, np.float32)
    best_i = np.full((b, k), -1, np.int64)
    for lo in range(0, count, chunk):
        hi = min(lo + chunk, count)
        x = data[lo:hi]
        d = (
            q_sq[:, None]
            - 2.0 * queries @ x.T
            + (x.astype(np.float32) ** 2).sum(1)[None, :]
        )
        cat_d = np.concatenate([best_d, d], axis=1)
        cat_i = np.concatenate(
            [best_i, np.broadcast_to(np.arange(lo, hi), (b, hi - lo))], axis=1
        )
        sel = np.argpartition(cat_d, k - 1, axis=1)[:, :k]
        best_d = np.take_along_axis(cat_d, sel, axis=1)
        best_i = np.take_along_axis(cat_i, sel, axis=1)
    order = np.argsort(best_d, axis=1)
    return np.take_along_axis(best_i, order, axis=1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=5_000_000)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--queries", type=int, default=100)
    ap.add_argument("--recent", type=float, default=0.02)
    ap.add_argument("--efs", type=int, nargs="+", default=[64, 128])
    ap.add_argument("--probes", type=int, nargs="+", default=[16, 32])
    ap.add_argument("--flat-only", action="store_true",
                    help="measure only the flat regime (skip pca + pruned)")
    ap.add_argument("--refine-sweep", action="store_true",
                    help="sweep bf16 refine pool widths + stage-2 placement")
    args = ap.parse_args()

    from fabstir_vectordb_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax

    from fabstir_vectordb_tpu.index import (
        HybridConfig, HybridIndex, IVFConfig, SearchConfig,
    )
    from fabstir_vectordb_tpu.utils import limits

    log(f"devices: {jax.devices()}  serving_dtype={limits.serving_dtype()}  "
        f"flat_threshold={limits.FLAT_THRESHOLD}")

    n, dim, k = args.n, args.dim, args.k
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    centers = rng.standard_normal((1024, dim)).astype(np.float32)
    vecs = centers[rng.integers(0, 1024, n)]
    # perturb in chunks (one 5Mx384 standard_normal temp would double RAM)
    for lo in range(0, n, 1_000_000):
        hi = min(lo + 1_000_000, n)
        vecs[lo:hi] += 0.35 * rng.standard_normal(
            (hi - lo, dim)).astype(np.float32)
    log(f"data: {n}x{dim} clustered, {time.perf_counter()-t0:.1f}s")

    idx = HybridIndex(dim, HybridConfig(
        ivf=IVFConfig(n_clusters=256, n_probe=16, train_size=10_000, seed=0),
        auto_migrate=False,
    ))
    t0 = time.perf_counter()
    idx.initialize(vecs[:10_000])
    log(f"IVF trained in {time.perf_counter()-t0:.1f}s")

    n_recent = int(n * args.recent)
    ts = np.full(n, NOW - 30 * DAY)
    ts[:n_recent] = NOW - DAY
    t0 = time.perf_counter()
    idx.insert_batch([f"v{i}" for i in range(n)], vecs, ts, now=NOW)
    build_s = time.perf_counter() - t0
    log(f"insert+build ({n_recent} HNSW / {n - n_recent} IVF): {build_s:.1f}s")

    qi = rng.integers(0, n, args.queries)
    queries = vecs[qi] + 0.1 * rng.standard_normal(
        (args.queries, dim)).astype(np.float32)

    t0 = time.perf_counter()
    truth = host_ground_truth(vecs, n, queries, k)
    log(f"host f32 ground truth: {time.perf_counter()-t0:.1f}s")
    del vecs  # free 7.7 GB; serving reads the store's own copy

    dev = idx.fused._device_state()
    hbm_vec_gb = dev["x"].nbytes / 1e9
    mirror_rows = int(dev["x"].shape[0])
    log(f"device mirror: {dev['x'].dtype} {dev['x'].shape} = {hbm_vec_gb:.1f} GB")
    # drop the script's reference: holding this dict pins the full-dim
    # mirror in HBM across the pca/pruned regime switches below (two
    # corpus mirrors + the pca state coexisting OOM'd a 5M run)
    del dev

    scale_tag = (f"{n//1_000_000}M" if n >= 1_000_000
                 else f"{n//1000}K")
    print(f"## {scale_tag} x {dim} serving, {limits.serving_dtype()} mirror "
          f"(build {build_s:.0f}s, {hbm_vec_gb:.1f} GB resident)\n")
    print("| path | ef | n_probe | recall@10 | p50 ms | p99 ms | QPS b=128 |")
    print("|---|---|---|---|---|---|---|")

    def measure(tag, ef, n_probe):
        cfg = SearchConfig(auto_migrate=False, hnsw_ef=ef, ivf_n_probe=n_probe)
        idx.search_rows(queries[0], k, config=cfg, now=NOW)  # compile
        lats, all_rows = [], []
        for i in range(args.queries):
            t0 = time.perf_counter()
            _, r = idx.search_rows(queries[i], k, config=cfg, now=NOW)
            lats.append((time.perf_counter() - t0) * 1000.0)
            all_rows.append(r[0])
        lats.sort()
        p50 = lats[len(lats) // 2]
        p99 = lats[int(len(lats) * 0.99)]
        rec = np.mean([
            len(set(r[r >= 0]) & set(truth[i])) / k
            for i, r in enumerate(all_rows)
        ])
        bq = np.repeat(queries, max(1, 128 // args.queries + 1), axis=0)[:128]
        idx.search_rows(bq, k, config=cfg, now=NOW)  # compile
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            idx.search_rows(bq, k, config=cfg, now=NOW)
        qps = 128 * reps / (time.perf_counter() - t0)
        print(f"| {tag} | {ef} | {n_probe} | {rec:.3f} "
              f"| {p50:.1f} | {p99:.1f} | {qps:,.0f} |", flush=True)
        log(json.dumps({"path": tag, "ef": ef, "n_probe": n_probe,
                        "recall": round(float(rec), 4),
                        "p50_ms": round(p50, 2), "p99_ms": round(p99, 2),
                        "qps": round(qps, 1)}))

    # --- regime 1: whatever the dtype-aware threshold picks (bf16 at <=8.4M
    # padded rows: the exact flat scan — matmuls stream at HBM bandwidth) ---
    eff = limits.effective_flat_threshold()
    flat_now = mirror_rows <= eff
    log(f"effective flat threshold {eff} -> "
        f"{'flat-exact' if flat_now else 'pruned'} serving at this scale")
    if flat_now:
        # with f32 rerank (default): exact near-tie ranking on bf16 mirrors
        measure("flat-exact", args.efs[0], args.probes[0])
        if args.refine_sweep:
            # pipelined: the host refine overlaps the NEXT batch's device
            # program (what the REST coalescer does under load)
            cfgp = SearchConfig(auto_migrate=False, hnsw_ef=args.efs[0],
                                ivf_n_probe=args.probes[0])
            rngq = np.random.default_rng(1)
            batches = [
                queries[rngq.integers(0, args.queries, 128)]
                for _ in range(10)
            ]
            idx.search_rows_pipelined(batches[:2], k, config=cfgp, now=NOW)
            t0 = time.perf_counter()
            idx.search_rows_pipelined(batches, k, config=cfgp, now=NOW,
                                      depth=4)
            qps_pipe = 128 * len(batches) / (time.perf_counter() - t0)
            log(json.dumps({"path": "flat-exact-pipelined",
                            "qps": round(qps_pipe, 1)}))
            print(f"(flat-exact pipelined: {qps_pipe:,.0f} QPS)", flush=True)
        if limits.serving_dtype() == "bfloat16":
            if args.refine_sweep:
                # decompose the refine cost: exact-pool width x stage-2
                # placement (FVDB_BF16_OVERSAMPLE / FVDB_BF16_REFINE)
                for ov in (64, 128, 256):
                    os.environ["FVDB_BF16_OVERSAMPLE"] = str(ov)
                    idx.fused._key = None
                    try:
                        measure(f"flat-refine-ov{ov}",
                                args.efs[0], args.probes[0])
                    finally:
                        os.environ.pop("FVDB_BF16_OVERSAMPLE", None)
                os.environ["FVDB_BF16_REFINE"] = "0"
                idx.fused._key = None
                try:
                    measure("flat-device-rerank",
                            args.efs[0], args.probes[0])
                finally:
                    os.environ.pop("FVDB_BF16_REFINE", None)
                idx.fused._key = None
            # control: raw bf16 scan — quantifies the rerank's recall gain
            # and its QPS cost (VERDICT r2 #3: target recall 1.000 at <=5%)
            os.environ["FVDB_BF16_RERANK"] = "0"
            try:
                measure("flat-no-rerank", args.efs[0], args.probes[0])
            finally:
                os.environ.pop("FVDB_BF16_RERANK", None)
            idx.fused._key = None

    if args.flat_only:
        return

    # --- regime 2: reduced-rank serving (PCA stage-1 + exact rerank) —
    # the DEFAULT plan past bf16 residency: matmul-bound, 4x less HBM ---
    old = limits.FLAT_THRESHOLD
    try:
        limits.FLAT_THRESHOLD = 0
        os.environ["FVDB_FLAT_THRESHOLD"] = "0"  # pin effective() too
        idx.fused._key = None
        idx.search_rows(queries[0], k, config=SearchConfig(
            auto_migrate=False), now=NOW)  # build projection state
        r_eff = int(idx.fused._proj["p"].shape[1])
        measure(f"pca-r{r_eff}", args.efs[0], args.probes[0])

        # --- regime 3: the pruned path (HNSW beam + IVF nprobe), the
        # fallback when FVDB_PCA_SERVE=0 ---
        os.environ["FVDB_PCA_SERVE"] = "0"
        idx.fused._key = None
        for ef in args.efs:
            for n_probe in args.probes:
                measure("pruned", ef, n_probe)
    finally:
        limits.FLAT_THRESHOLD = old
        os.environ.pop("FVDB_FLAT_THRESHOLD", None)
        os.environ.pop("FVDB_PCA_SERVE", None)
        idx.fused._key = None


if __name__ == "__main__":
    main()
