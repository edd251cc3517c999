"""On-demand cold serving: answer queries during a lazy load.

A lazily-loaded index has its sidecars (id map, timestamps, IVF centroids +
assignments, full HNSW graph) resident after a few small fetches, but the
vector chunks are still streaming in the background. Instead of blocking the
first search on full materialization, this module serves it by fetching ONLY
the chunks the query plan touches:

  - all HNSW-member rows (the "recent" set — a small contiguous span, because
    ``save_index_chunked`` groups HNSW members first), and
  - the rows of the ``n_probe`` IVF clusters nearest each query (contiguous
    spans too — the save order groups IVF rows by cluster).

Candidates are scored exactly on the host (one BLAS matmul over the gathered
rows). The candidate set is a superset of what the pruned device path scans
(ALL HNSW members brute-forced vs. a beam; identical IVF probe lists), so
cold results are at least as accurate as warm pruned results.

This is the TPU-era shape of the reference's lazy chunk-on-demand design
(reference: src/storage/chunk_loader.rs — cache/dedup/retry fetches;
src/hybrid/persistence.rs:497-570 — lazy load returning before chunk data;
README.md:24-26 — searchable immediately, first search pays chunk fetches):
there the graph traversal faulted chunks in one at a time; here the probe
list is known up front, so the fetch set is batched through the loader's
thread pool and the scan is one matmul.
"""
from __future__ import annotations

import threading
import time

import numpy as np


class ColdServing:
    """Query serving over a partially-materialized store.

    Shared between the background materializer (which marks chunks filled
    as they stream in) and search callers (which fetch + fill any missing
    chunks their plan needs). Both write identical data into disjoint-or-
    identical row ranges, so the benign double-fill race is harmless.
    """

    def __init__(self, hybrid, loader, keys: list, chunk_size: int,
                 hnsw_span, cluster_spans: dict, total: int):
        self.hybrid = hybrid
        self.loader = loader
        self.keys = keys
        self.chunk_size = max(int(chunk_size), 1)
        self.hnsw_span = (int(hnsw_span[0]), int(hnsw_span[1]))
        self.cluster_spans = {
            int(c): (int(lo), int(hi))
            for c, (lo, hi) in (cluster_spans or {}).items()
        }
        self.total = int(total)
        self.filled = np.zeros(len(keys), bool)
        self._lock = threading.Lock()
        self.on_demand_fetches = 0
        self._pending = 0  # live on-demand fetch loops (materializer yields)

    # ------------------------------------------------------------- tracking
    def mark_filled(self, chunk_idx: int) -> None:
        """Materializer callback: chunk ``chunk_idx``'s rows are resident."""
        with self._lock:
            self.filled[chunk_idx] = True

    def is_filled(self, chunk_idx: int) -> bool:
        with self._lock:
            return bool(self.filled[chunk_idx])

    def hold_materializer(self) -> None:
        """Park the background materializer at its next between-chunks
        yield point, where it holds NO locks (unlike mid-fetch, where it
        holds the loader's in-flight dedup lock for the chunk). Pairs
        with :meth:`release_materializer`. Lets admin/throttling code —
        and deterministic tests — stop background IO without stalling
        on-demand serving."""
        with self._lock:
            self._pending += 1

    def release_materializer(self) -> None:
        with self._lock:
            self._pending -= 1

    def yield_to_searches(self) -> None:
        """Materializer callback between chunks: on a few-core host the
        background fill and an on-demand fetch contend for the same CPU
        (reads, CBOR decode, memcpy), roughly doubling time-to-first-
        search; sleeping while a search's fetch loop is live hands it the
        core. Measured at 1M/100 chunks: first search 53 s -> seconds."""
        while True:
            with self._lock:
                if self._pending == 0:
                    return
            time.sleep(0.01)

    def stats(self) -> dict:
        with self._lock:
            done = int(self.filled.sum())
        return {
            "chunks_total": len(self.keys),
            "chunks_resident": done,
            "chunks_fetched_on_demand": self.on_demand_fetches,
        }

    # -------------------------------------------------------------- serving
    def _ensure_spans(self, spans) -> None:
        """Fetch + fill every chunk overlapping the given position spans.

        Fetches do NOT go through the loader's shared thread pool: the
        background materializer keeps that pool's queue full for the whole
        load, so a pooled on-demand fetch would wait for the entire backlog
        (the exact head-of-line blocking this path exists to avoid). Calls
        hit ``load_chunk`` directly — its in-flight dedup still coalesces a
        fetch the materializer already has running — from this thread on
        serial (local) stores, or a small private pool when the store
        declares ``parallel_fetch`` (network stores release the GIL in
        ``get``)."""
        cs = self.chunk_size
        need: set = set()
        for lo, hi in spans:
            if hi > lo:
                need.update(range(lo // cs, (hi - 1) // cs + 1))
        with self._lock:
            missing = [i for i in sorted(need) if not self.filled[i]]
        if not missing:
            return
        store = self.hybrid.store

        def _fill(i: int) -> None:
            if self.is_filled(i):  # materializer got there first
                return
            chunk = self.loader.load_chunk(self.keys[i])
            with self._lock:
                if self.filled[i]:
                    return
                if chunk.data.shape[0]:
                    store.fill_rows(chunk.start_idx, chunk.data)
                self.filled[i] = True
                self.on_demand_fetches += 1

        with self._lock:
            self._pending += 1  # materializer yields until we finish
        try:
            if getattr(self.loader.store, "parallel_fetch", False) \
                    and len(missing) > 1:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(
                        max_workers=min(8, len(missing))) as ex:
                    list(ex.map(_fill, missing))
            else:
                for i in missing:
                    _fill(i)
        finally:
            with self._lock:
                self._pending -= 1

    def _probe_spans(self, queries: np.ndarray, n_probe: int) -> list:
        """Position spans for the batch's candidate set: the HNSW span plus
        the union of each query's ``n_probe`` nearest clusters' spans."""
        spans = []
        if self.hnsw_span[1] > self.hnsw_span[0]:
            spans.append(self.hnsw_span)
        ivf = self.hybrid.ivf
        if ivf.trained and self.cluster_spans:
            c = ivf.centroids  # [C, D] f32, host
            # norm-expansion distances: one [B, C] matmul, C is small
            d = (
                np.einsum("cd,cd->c", c, c)[None, :]
                - 2.0 * queries @ c.T
            )
            n_probe = min(max(n_probe, 1), c.shape[0])
            probe = np.argpartition(d, n_probe - 1, axis=1)[:, :n_probe]
            for cid in np.unique(probe):
                span = self.cluster_spans.get(int(cid))
                if span is not None:
                    spans.append(span)
        return spans

    def search_rows(
        self,
        queries: np.ndarray,
        k: int,
        n_probe: int,
        extra_mask: np.ndarray | None = None,
    ):
        """Exact host scan over the plan's candidate rows.

        Returns (dists [B, k] euclidean, rows [B, k]) — the same contract as
        ``HybridIndex.search_rows``.
        """
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        b = queries.shape[0]
        spans = self._probe_spans(queries, n_probe)
        self._ensure_spans(spans)

        store = self.hybrid.store
        parts = [np.arange(lo, min(hi, store.count), dtype=np.int64)
                 for lo, hi in spans]
        rows = (np.concatenate(parts) if parts
                else np.zeros(0, np.int64))
        if rows.size:
            keep = ~store.deleted[rows]
            if extra_mask is not None and extra_mask.shape[0] > 0:
                em = np.asarray(extra_mask, bool)
                safe = np.minimum(rows, em.shape[0] - 1)
                keep &= em[safe] & (rows < em.shape[0])
            rows = rows[keep]
        if rows.size == 0:
            return (np.full((b, k), np.inf, np.float32),
                    np.full((b, k), -1, np.int32))

        x = store.data[rows]  # [M, D]
        # norm-expansion selection + difference-form rescore of the winners
        # (same exactness recipe as the warm host rerank paths)
        x_sq = np.einsum("md,md->m", x, x)
        dots = x @ queries.T  # [M, B]
        q_sq = np.einsum("bd,bd->b", queries, queries)
        d = x_sq[:, None] - 2.0 * dots + q_sq[None, :]  # [M, B]
        k_eff = min(k, rows.size)
        sel = np.argpartition(d, k_eff - 1, axis=0)[:k_eff]  # [k_eff, B]
        out_d = np.full((b, k), np.inf, np.float32)
        out_r = np.full((b, k), -1, np.int32)
        for i in range(b):
            cand = rows[sel[:, i]]
            diff = store.data[cand] - queries[i][None, :]
            dd = np.einsum("kd,kd->k", diff, diff)
            order = np.argsort(dd, kind="stable")
            out_d[i, :k_eff] = np.sqrt(np.maximum(dd[order], 0.0))
            out_r[i, :k_eff] = cand[order]
        return out_d, out_r
