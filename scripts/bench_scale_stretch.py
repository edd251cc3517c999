#!/usr/bin/env python
"""Capacity-ladder stretch run: the reduced-rank regime beyond 10M rows.

Runs ONLY the beyond-bf16-residency phase of bench.py at a larger corpus
(default 20M x 384) with the measured-recall oversample calibration
enabled (``FVDB_PCA_OVERSAMPLE=auto``), emitting the same
``scale_beyond_flat_{p50,qps,recall}_<n>k_384d_k10`` metrics against the
exact-f32 streamed oracle. This is the documented >=20M operating point
(VERDICT r3 #10); the reference's scale ceiling is its 1M-row chunked
integration test (reference: tests/integration/large_dataset_tests.rs).

At 20M x 384 on a 16 GB v5e chip the rank-192 bf16 projected mirror is
7.7 GB, so the full-dim bf16 rerank mirror (15.4 GB) no longer fits
alongside it — ``want_device_rerank`` (index/fused.py) detects this and
stage 2 reranks on the host from the f32 store. That fallback is exactly
what this run exercises and measures.

Usage (about 35-50 min cold, minutes warm from the corpus cache):
    python scripts/bench_scale_stretch.py            # 20M
    FVDB_STRETCH_N=30000000 python scripts/bench_scale_stretch.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

n = int(os.environ.get("FVDB_STRETCH_N", 20_000_000))
os.environ["FVDB_BENCH_10M_N"] = str(n)
os.environ.setdefault(
    "FVDB_BENCH_10M_CACHE", f"/tmp/fvdb_bench{n // 1_000_000}m")
# calibrated-recall operating point: rank pinned at the documented 192,
# oversample measured against the probe oracle (not the pinned 96 the
# 10M driver phase uses) — bench_10m setdefaults, so pre-set wins
os.environ.setdefault("FVDB_PCA_RANK", "192")
os.environ.setdefault("FVDB_PCA_OVERSAMPLE", "auto")
# this is a manual documentation run, not a driver run: give it room,
# and stretch the POST stall limit (the watchdog below starts in post
# mode, so this is the limit that applies) to cover slow-tunnel mirror
# work — the rerank upload itself now heartbeats per 256 MB block
# (utils/transfer.put_bf16_blocks), so the limit only guards true stalls
os.environ.setdefault("FVDB_BENCH_BUDGET_S", "5400")
os.environ.setdefault("FVDB_BENCH_STALL_POST_S", "1800")

import numpy as np  # noqa: E402

import bench  # noqa: E402

# post-mode stall watchdog: bench_10m is called directly (bench.main()
# never runs, so nothing else would start one — ADVICE r4: the env knob
# above was dead, and the PRE limit would have killed legit transfers)
bench._start_watchdog(post=True)
bench.log(f"stretch run: n={n}")
ok = bench.bench_10m(384, 10, np.random.default_rng(0))
bench.emit_summary()
bench.log(f"stretch run {'complete' if ok else 'hit the budget guard'} "
          f"at {bench.time.monotonic() - bench._T0:.0f}s")
sys.exit(0 if ok else 1)
