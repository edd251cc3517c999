"""Recall-vs-parameter sweep harness: recall@k + latency across ef / n_probe.

Generalizes the reference's ``evaluate_search_quality`` (reference:
src/ivf/operations.rs:329-391 — recall/precision vs a full-scan ground truth)
to the whole hybrid engine: builds a corpus, sweeps (hnsw_ef, ivf_n_probe)
through the pruned path AND reports the exact flat path as the oracle row.

Usage:
  python scripts/sweep_recall.py [--n 100000] [--dim 384] [--k 10]
      [--queries 128] [--clustered] [--threshold 2048]

Emits a markdown table on stdout; one JSON line per cell on stderr.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse
import json
import sys
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--queries", type=int, default=128)
    ap.add_argument("--clustered", action="store_true", default=True)
    ap.add_argument("--threshold", type=int, default=2048,
                    help="FVDB_FLAT_THRESHOLD override (forces pruned path)")
    ap.add_argument("--recent", type=float, default=0.10,
                    help="fraction of rows in the HNSW recent tier")
    ap.add_argument("--efs", type=int, nargs="+", default=[16, 32, 64, 128])
    ap.add_argument("--probes", type=int, nargs="+", default=[4, 8, 16, 32])
    args = ap.parse_args()

    from fabstir_vectordb_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from fabstir_vectordb_tpu.index import (
        FlatIndex, HybridConfig, HybridIndex, IVFConfig, SearchConfig,
    )
    from fabstir_vectordb_tpu.index.flat import recall_at_k
    from fabstir_vectordb_tpu.utils import limits

    rng = np.random.default_rng(0)
    n, dim, k = args.n, args.dim, args.k
    if args.clustered:
        centers = rng.standard_normal((1024, dim)).astype(np.float32)
        vecs = centers[rng.integers(0, 1024, n)] + 0.35 * rng.standard_normal(
            (n, dim)).astype(np.float32)
    else:
        vecs = rng.standard_normal((n, dim)).astype(np.float32)

    idx = HybridIndex(dim, HybridConfig(
        ivf=IVFConfig(n_clusters=256, n_probe=16, train_size=10_000, seed=0),
        auto_migrate=False,
    ))
    idx.initialize(vecs[:10_000])
    NOW = 1_700_000_000.0
    ts = np.full(n, NOW - 30 * 86400.0)
    ts[: int(n * args.recent)] = NOW - 86400.0
    t0 = time.perf_counter()
    idx.insert_batch([f"v{i}" for i in range(n)], vecs, ts, now=NOW)
    print(f"built {n}x{dim} in {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    qi = rng.integers(0, n, args.queries)
    queries = vecs[qi] + 0.1 * rng.standard_normal(
        (args.queries, dim)).astype(np.float32)
    oracle = FlatIndex(idx.store)

    rows_out = ["| path | ef | n_probe | recall@%d | p50 ms (b=1) |" % k,
                "|---|---|---|---|---|"]

    def cell(tag, ef, probe, cfg):
        _, r = idx.search_rows(queries, k, config=cfg, now=NOW)
        rec = recall_at_k(oracle, r, queries, k)
        lat = []
        for i in range(min(32, args.queries)):
            t0 = time.perf_counter()
            idx.search_rows(queries[i], k, config=cfg, now=NOW)
            lat.append((time.perf_counter() - t0) * 1e3)
        p50 = sorted(lat)[len(lat) // 2]
        rows_out.append(f"| {tag} | {ef} | {probe} | {rec:.3f} | {p50:.2f} |")
        print(json.dumps({"path": tag, "ef": ef, "n_probe": probe,
                          "recall": round(rec, 4), "p50_ms": round(p50, 3)}),
              file=sys.stderr, flush=True)

    # oracle row: exact flat path
    cell("flat-exact", 0, 0, SearchConfig(auto_migrate=False))

    # pruned path sweep
    old = limits.FLAT_THRESHOLD
    limits.FLAT_THRESHOLD = args.threshold
    try:
        for ef in args.efs:
            for probe in args.probes:
                cfg = SearchConfig(auto_migrate=False, hnsw_ef=ef,
                                   ivf_n_probe=probe)
                cell("pruned", ef, probe, cfg)
    finally:
        limits.FLAT_THRESHOLD = old

    print("\n".join(rows_out))


if __name__ == "__main__":
    main()
