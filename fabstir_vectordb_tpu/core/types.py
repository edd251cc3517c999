"""Core identifier / embedding / result types.

Feature parity with the reference's core types (reference: src/core/types.rs):
  - ``VectorId``: 32-byte content hash of the user-provided string id,
    displayed as ``vec_<8 hex>``; the original string is NOT recoverable from
    it, so the session layer preserves originals in metadata ``_originalId``
    (src/core/types.rs:19-34). The reference uses blake3; we use blake2b-256
    (stdlib) — same contract: deterministic, collision-resistant, one-way.
  - ``Embedding`` with cosine similarity / euclidean distance
    (src/core/types.rs:79-120).
  - ``SearchResult`` ordered by distance, with deduplication keeping the best
    score per id (src/core/types.rs:206-224).

In the TPU engine itself, vectors are rows of dense arrays and ids are row
indices; these types live at the API boundary only.
"""
from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from typing import Any, Iterable

import numpy as np


class VectorId:
    """Content-addressed vector identifier (32-byte digest of a user string)."""

    __slots__ = ("digest",)

    def __init__(self, digest: bytes):
        if len(digest) != 32:
            raise ValueError("VectorId digest must be 32 bytes")
        self.digest = digest

    @classmethod
    def from_string(cls, s: str) -> "VectorId":
        return cls(hashlib.blake2b(s.encode("utf-8"), digest_size=32).digest())

    @classmethod
    def from_hex(cls, h: str) -> "VectorId":
        return cls(bytes.fromhex(h))

    def to_hex(self) -> str:
        return self.digest.hex()

    def __str__(self) -> str:  # display form: vec_<first 8 hex chars>
        return f"vec_{self.digest.hex()[:8]}"

    def __repr__(self) -> str:
        return f"VectorId({self})"

    def __eq__(self, other) -> bool:
        return isinstance(other, VectorId) and self.digest == other.digest

    def __hash__(self) -> int:
        return hash(self.digest)


@dataclass
class Embedding:
    """A dense embedding with basic similarity helpers."""

    values: np.ndarray

    def __post_init__(self):
        self.values = np.asarray(self.values, dtype=np.float32)

    @property
    def dimension(self) -> int:
        return int(self.values.shape[-1])

    def cosine_similarity(self, other: "Embedding") -> float:
        a, b = self.values, other.values
        denom = float(np.linalg.norm(a) * np.linalg.norm(b))
        if denom == 0.0:
            return 0.0
        return float(np.dot(a, b) / denom)

    def euclidean_distance(self, other: "Embedding") -> float:
        return float(np.linalg.norm(self.values - other.values))


@dataclass
class Vector:
    """A stored vector: id + embedding + optional metadata."""

    id: VectorId
    embedding: Embedding
    metadata: Any = None


@dataclass(order=False)
class SearchResult:
    """A search hit; orders by ascending distance."""

    id: str
    distance: float
    score: float = 0.0
    metadata: Any = None
    vector: list | None = None

    def __lt__(self, other: "SearchResult") -> bool:
        return self.distance < other.distance


def deduplicate_results(results: Iterable[SearchResult]) -> list[SearchResult]:
    """Keep the best (smallest distance) result per id, preserving sort order."""
    best: dict[str, SearchResult] = {}
    for r in results:
        cur = best.get(r.id)
        if cur is None or r.distance < cur.distance:
            best[r.id] = r
    return sorted(best.values())


def distance_to_score(distance: float) -> float:
    """The SDK scoring rule: score = 1 / (1 + distance).

    (reference: bindings/node/src/session.rs:225-293 and
    src/api/rest.rs:599-677 use the same mapping.)
    """
    return 1.0 / (1.0 + float(distance))
