"""Video-domain helpers of the embedded bindings.

Mirrors the reference WASM video module (reference:
bindings/wasm/src/video.rs): ``VideoSimilarityIndex.find_similar`` (cosine,
descending, includes the query video itself), ``VideoRecommender.
recommend_from_history`` (mean-of-history embedding, excludes watched),
and ``VideoClustering.cluster`` (cosine k-means, deterministic strided
init, <=20 iterations, converges when assignments stop changing, empty
clusters dropped). The k-means inner loop runs in the native C++ runtime
when available.
"""
from __future__ import annotations

import ctypes
from dataclasses import dataclass, field

import numpy as np

from ..native import NativeUnavailable, load_library
from .vector import batch_cosine

try:
    _lib = load_library()
except NativeUnavailable:  # pragma: no cover
    _lib = None

_FP = ctypes.POINTER(ctypes.c_float)


@dataclass
class _VideoEntry:
    id: str
    embedding: np.ndarray
    tags: list = field(default_factory=list)
    metadata: dict = field(default_factory=dict)


@dataclass
class SimilarVideo:
    id: str
    similarity: float


@dataclass
class VideoRecommendation:
    id: str
    score: float
    category: str


@dataclass
class VideoCluster:
    cluster_id: int
    centroid: np.ndarray
    video_ids: list


class VideoSimilarityIndex:
    """Find videos similar to a stored video (video.rs:14-86)."""

    def __init__(self):
        self._videos: list[_VideoEntry] = []

    def add_video(self, vid: str, embedding, tags: list | None = None) -> None:
        emb = np.ascontiguousarray(embedding, np.float32)
        self._videos.append(_VideoEntry(vid, emb, list(tags or [])))

    def find_similar(self, video_id: str, k: int) -> list[SimilarVideo]:
        query = next((v for v in self._videos if v.id == video_id), None)
        if query is None:
            raise KeyError(f"Video '{video_id}' not found")
        rows = np.stack([v.embedding for v in self._videos])
        sims = batch_cosine(rows, query.embedding)
        order = np.argsort(-sims, kind="stable")[:k]
        return [
            SimilarVideo(self._videos[i].id, float(sims[i])) for i in order
        ]


class VideoRecommender:
    """Recommend unwatched videos near the mean of a watch history
    (video.rs:88-191)."""

    def __init__(self):
        self._videos: dict[str, _VideoEntry] = {}

    def add_video(self, vid: str, embedding, category: str) -> None:
        emb = np.ascontiguousarray(embedding, np.float32)
        self._videos[vid] = _VideoEntry(
            vid, emb, metadata={"category": category}
        )

    def recommend_from_history(
        self, watch_history: list[str], k: int
    ) -> list[VideoRecommendation]:
        watched = [
            self._videos[v] for v in watch_history if v in self._videos
        ]
        if not watched:
            return []
        avg = np.mean([v.embedding for v in watched], axis=0).astype(
            np.float32
        )
        history = set(watch_history)
        pool = [v for v in self._videos.values() if v.id not in history]
        if not pool:
            return []
        sims = batch_cosine(np.stack([v.embedding for v in pool]), avg)
        order = np.argsort(-sims, kind="stable")[:k]
        return [
            VideoRecommendation(
                pool[i].id,
                float(sims[i]),
                pool[i].metadata.get("category", "unknown"),
            )
            for i in order
        ]


class VideoClustering:
    """Cosine k-means over stored videos (video.rs:193-329)."""

    MAX_ITERATIONS = 20

    def __init__(self):
        self._videos: list[_VideoEntry] = []

    def add_video(self, vid: str, embedding) -> None:
        emb = np.ascontiguousarray(embedding, np.float32)
        self._videos.append(_VideoEntry(vid, emb))

    def cluster(self, k: int) -> list[VideoCluster]:
        if not self._videos or k <= 0:
            return []
        n = len(self._videos)
        k = min(k, n)
        data = np.stack([v.embedding for v in self._videos])
        dim = data.shape[1]
        assignments = np.zeros(n, np.int32)
        centroids = np.zeros((k, dim), np.float32)

        if _lib is not None:
            _lib.fvdb_kmeans_cosine(
                data.ctypes.data_as(_FP), n, dim, k, self.MAX_ITERATIONS,
                assignments.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                centroids.ctypes.data_as(_FP),
            )
        else:
            step = n // k
            centroids = data[np.arange(k) * step].copy()
            for _ in range(self.MAX_ITERATIONS):
                norms = np.linalg.norm(data, axis=1, keepdims=True)
                cnorms = np.linalg.norm(centroids, axis=1, keepdims=True)
                denom = norms @ cnorms.T
                with np.errstate(divide="ignore", invalid="ignore"):
                    sims = np.where(denom > 0, (data @ centroids.T) / denom, 0)
                new_assign = np.argmax(sims, axis=1).astype(np.int32)
                if np.array_equal(new_assign, assignments):
                    break
                assignments = new_assign
                for j in range(k):
                    members = data[assignments == j]
                    if len(members):
                        centroids[j] = members.mean(axis=0)

        clusters = []
        for j in range(k):
            ids = [
                self._videos[i].id for i in range(n) if assignments[i] == j
            ]
            if ids:
                clusters.append(VideoCluster(j, centroids[j].copy(), ids))
        return clusters
