"""Vector math surface of the embedded bindings.

Mirrors the reference WASM vector module (reference:
bindings/wasm/src/vector.rs): ``Vector`` with dimension/get/normalize/
magnitude, ``VectorBatch.compute_similarities`` (one query vs all rows,
cosine), module-level ``cosine_similarity`` / ``euclidean_distance`` with
dimension-mismatch errors, and a ``cosine_similarity_simd`` alias (the
reference's "simd" variant delegates to the scalar one, vector.rs:138-144;
here the native path IS the vectorized one).

Hot math runs in the native C++ runtime when available (threaded batch
cosine), else numpy.
"""
from __future__ import annotations

import ctypes

import numpy as np

from ..native import NativeUnavailable, load_library

try:
    _lib = load_library()
except NativeUnavailable:  # pragma: no cover - native always builds in CI
    _lib = None

_FP = ctypes.POINTER(ctypes.c_float)


def _as_f32(data) -> np.ndarray:
    return np.ascontiguousarray(data, np.float32)


class Vector:
    """Immutable f32 vector (reference: vector.rs:4-54)."""

    def __init__(self, data):
        self._data = _as_f32(data)
        if self._data.ndim != 1:
            raise ValueError("Vector expects a 1-D array")

    def dimension(self) -> int:
        return int(self._data.shape[0])

    def get(self, index: int) -> float:
        if not 0 <= index < self._data.shape[0]:
            raise IndexError(f"Index {index} out of bounds")
        return float(self._data[index])

    def magnitude(self) -> float:
        if _lib is not None:
            return float(_lib.fvdb_vec_magnitude(
                self._data.ctypes.data_as(_FP), self.dimension()))
        return float(np.linalg.norm(self._data))

    def normalize(self) -> "Vector":
        mag = self.magnitude()
        if mag > 0.0:
            return Vector(self._data / mag)
        return Vector(self._data.copy())

    def as_array(self) -> np.ndarray:
        return self._data

    def __len__(self) -> int:
        return self.dimension()

    def __repr__(self) -> str:
        return f"Vector(dim={self.dimension()})"


class VectorBatch:
    """Append-only batch with one-vs-all cosine similarities
    (reference: vector.rs:56-84)."""

    def __init__(self):
        self._vectors: list[np.ndarray] = []

    def add_vector(self, vector: Vector) -> None:
        self._vectors.append(vector.as_array())

    def length(self) -> int:
        return len(self._vectors)

    def __len__(self) -> int:
        return len(self._vectors)

    def compute_similarities(self, query: Vector) -> np.ndarray:
        if not self._vectors:
            return np.zeros(0, np.float32)
        rows = np.stack(self._vectors)
        q = query.as_array()
        return batch_cosine(rows, q)


def batch_cosine(rows: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Cosine similarity of ``q`` against each row; zero-magnitude rows or
    query yield 0.0 (the reference's convention, vector.rs:130-134)."""
    rows = _as_f32(rows)
    q = _as_f32(q)
    n, dim = rows.shape
    if _lib is not None:
        out = np.empty(n, np.float32)
        _lib.fvdb_vec_batch_cosine(
            rows.ctypes.data_as(_FP), n, dim, q.ctypes.data_as(_FP),
            out.ctypes.data_as(_FP), 8,
        )
        return out
    qn = np.linalg.norm(q)
    rn = np.linalg.norm(rows, axis=1)
    denom = rn * qn
    with np.errstate(divide="ignore", invalid="ignore"):
        sims = (rows @ q) / denom
    return np.where(denom > 0, sims, 0.0).astype(np.float32)


def _check_dims(a: Vector, b: Vector) -> None:
    if a.dimension() != b.dimension():
        raise ValueError(
            f"Dimension mismatch: {a.dimension()} != {b.dimension()}"
        )


def cosine_similarity(vec1: Vector, vec2: Vector) -> float:
    _check_dims(vec1, vec2)
    if _lib is not None:
        return float(_lib.fvdb_vec_cosine(
            vec1.as_array().ctypes.data_as(_FP),
            vec2.as_array().ctypes.data_as(_FP), vec1.dimension()))
    return float(batch_cosine(vec1.as_array()[None, :], vec2.as_array())[0])


def euclidean_distance(vec1: Vector, vec2: Vector) -> float:
    _check_dims(vec1, vec2)
    if _lib is not None:
        return float(_lib.fvdb_vec_euclidean(
            vec1.as_array().ctypes.data_as(_FP),
            vec2.as_array().ctypes.data_as(_FP), vec1.dimension()))
    return float(np.linalg.norm(vec1.as_array() - vec2.as_array()))


def cosine_similarity_simd(vec1: Vector, vec2: Vector) -> float:
    return cosine_similarity(vec1, vec2)
