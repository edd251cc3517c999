"""Search integration helpers: merging, scoring, query tuning, caching.

Parity with the reference search-integration layer
(reference: src/hybrid/search_integration.rs):
  - ``parallel_search`` with timeout + score weighting (:125-211) — both
    engines already run as device programs; here we add the weighted-score
    merge and the timeout;
  - ``ResultMerger`` strategies TakeBest / Average / Weighted (:214-296);
  - ``RelevanceScorer``: cosine(+boost), time-decay half-life, popularity
    boost (log views), combined (:298-373);
  - ``QueryOptimizer`` suggesting ef / n_probe from dataset size (:375-450);
  - ``QueryExpander`` noise-perturbed query variants (:452-489);
  - ``CachedHybridIndex``: query-hash result cache with FIFO eviction and
    hit-rate stats (:554-624).

(The perf monitor lives in utils.tracing.PerfMonitor, :491-552.)
"""
from __future__ import annotations

import hashlib
import math
import time
from collections import OrderedDict
from concurrent.futures import ThreadPoolExecutor, TimeoutError as FuturesTimeout
from dataclasses import dataclass

import numpy as np

from ..index.hybrid import HybridIndex, SearchConfig


def parallel_search(
    index: HybridIndex,
    query: np.ndarray,
    k: int,
    hnsw_weight: float = 1.0,
    ivf_weight: float = 1.0,
    timeout_secs: float | None = None,
    now: float | None = None,
) -> list:
    """Run HNSW and IVF searches concurrently, weight scores (1-d)*w, merge.

    Returns [(id, weighted_score)] descending. With a timeout, an engine
    that overruns contributes no results (reference behavior).
    """
    pool = ThreadPoolExecutor(max_workers=2)
    futures = {}
    if index.hnsw.num_nodes > 0:
        futures["hnsw"] = pool.submit(
            index.hnsw.search_rows, np.atleast_2d(query), k
        )
    if index.ivf.trained and index.ivf.member_rows().size > 0:
        futures["ivf"] = pool.submit(
            index.ivf.search_rows, np.atleast_2d(query), k
        )
    merged: dict[str, float] = {}
    for name, fut in futures.items():
        try:
            d, rows = fut.result(timeout=timeout_secs)
        except FuturesTimeout:
            continue
        w = hnsw_weight if name == "hnsw" else ivf_weight
        for dist, row in zip(d[0], rows[0]):
            if row < 0 or not np.isfinite(dist):
                continue
            vid = index.store.id_of(int(row))
            if vid is None:
                continue
            score = (1.0 - float(dist)) * w
            if vid not in merged or score > merged[vid]:
                merged[vid] = score
    pool.shutdown(wait=False)
    out = sorted(merged.items(), key=lambda kv: -kv[1])[:k]
    return out


class ResultMerger:
    """Merge duplicate-id results across engines (strategies TakeBest /
    Average / Weighted)."""

    def __init__(self, strategy: str = "take_best", weights: dict | None = None):
        if strategy not in ("take_best", "average", "weighted"):
            raise ValueError(f"unknown merge strategy {strategy!r}")
        self.strategy = strategy
        self.weights = weights or {}

    def merge(self, result_sets: dict, k: int) -> list:
        """result_sets: {source_name: [(id, score)]} -> [(id, score)] desc."""
        acc: dict[str, list] = {}
        for source, results in result_sets.items():
            w = self.weights.get(source, 1.0)
            for vid, score in results:
                acc.setdefault(vid, []).append(
                    (score * w) if self.strategy == "weighted" else score
                )
        merged = []
        for vid, scores in acc.items():
            if self.strategy == "average":
                merged.append((vid, sum(scores) / len(scores)))
            else:  # take_best / weighted
                merged.append((vid, max(scores)))
        merged.sort(key=lambda kv: -kv[1])
        return merged[:k]


class RelevanceScorer:
    """Composable relevance scoring beyond raw distance."""

    def __init__(self, mode: str = "cosine", boost: float = 1.0,
                 half_life_secs: float = 7 * 86400.0, weights: tuple = (1.0, 0.0, 0.0)):
        self.mode = mode
        self.boost = boost
        self.half_life = half_life_secs
        self.weights = weights

    def cosine_score(self, distance: float) -> float:
        return max(0.0, 1.0 - distance) * self.boost

    def time_decay(self, age_secs: float) -> float:
        return math.pow(0.5, max(age_secs, 0.0) / self.half_life)

    @staticmethod
    def popularity_boost(views: float) -> float:
        return math.log1p(max(views, 0.0))

    def score(self, distance: float, age_secs: float = 0.0, views: float = 0.0) -> float:
        if self.mode == "cosine":
            return self.cosine_score(distance)
        if self.mode == "time_decay":
            return self.cosine_score(distance) * self.time_decay(age_secs)
        if self.mode == "popularity":
            return self.cosine_score(distance) + self.popularity_boost(views)
        if self.mode == "combined":
            wc, wt, wp = self.weights
            return (
                wc * self.cosine_score(distance)
                + wt * self.time_decay(age_secs)
                + wp * self.popularity_boost(views)
            )
        raise ValueError(f"unknown scorer mode {self.mode!r}")


class QueryOptimizer:
    """Suggest ef / n_probe from dataset size (reference heuristic shape)."""

    def suggest(self, n_vectors: int, target_recall: float = 0.9) -> dict:
        if n_vectors < 1_000:
            ef, n_probe = 32, 4
        elif n_vectors < 10_000:
            ef, n_probe = 50, 8
        elif n_vectors < 100_000:
            ef, n_probe = 64, 16
        elif n_vectors < 1_000_000:
            ef, n_probe = 96, 24
        else:
            ef, n_probe = 128, 32
        if target_recall > 0.95:
            ef, n_probe = ef * 2, n_probe * 2
        return {"hnsw_ef": ef, "ivf_n_probe": n_probe}

    def search_config(self, n_vectors: int, target_recall: float = 0.9) -> SearchConfig:
        s = self.suggest(n_vectors, target_recall)
        return SearchConfig(hnsw_ef=s["hnsw_ef"], ivf_n_probe=s["ivf_n_probe"])


class QueryExpander:
    """Noise-perturbed query variants for recall-boosting multi-query search."""

    def __init__(self, n_variants: int = 3, noise_scale: float = 0.01, seed: int = 0):
        self.n_variants = n_variants
        self.noise_scale = noise_scale
        self._rng = np.random.default_rng(seed)

    def expand(self, query: np.ndarray) -> np.ndarray:
        q = np.asarray(query, np.float32)
        noise = self._rng.standard_normal(
            (self.n_variants, q.shape[-1])
        ).astype(np.float32) * self.noise_scale * np.linalg.norm(q)
        return np.concatenate([q[None, :], q[None, :] + noise], axis=0)


@dataclass
class CacheHitStats:
    hits: int = 0
    misses: int = 0

    @property
    def hit_rate(self) -> float:
        t = self.hits + self.misses
        return self.hits / t if t else 0.0


class CachedHybridIndex:
    """Query-result cache in front of a HybridIndex (FIFO eviction)."""

    def __init__(self, index: HybridIndex, max_entries: int = 1000,
                 quantize_decimals: int = 5):
        self.index = index
        self.max_entries = max_entries
        self.quantize = quantize_decimals
        self._cache: OrderedDict[str, list] = OrderedDict()
        self.stats = CacheHitStats()

    def _key(self, query: np.ndarray, k: int) -> str:
        q = np.round(np.asarray(query, np.float32), self.quantize)
        h = hashlib.sha256(q.tobytes())
        h.update(str(k).encode())
        return h.hexdigest()

    def search(self, query: np.ndarray, k: int, now: float | None = None) -> list:
        key = self._key(query, k)
        if key in self._cache:
            self.stats.hits += 1
            return self._cache[key]
        self.stats.misses += 1
        results = self.index.search(query, k, now=now)
        self._cache[key] = results
        while len(self._cache) > self.max_entries:
            self._cache.popitem(last=False)  # FIFO
        return results

    def invalidate(self) -> None:
        self._cache.clear()
