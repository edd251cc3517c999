#!/usr/bin/env python
"""Filtered-search walkthrough (twin of reference examples/test_search_filter.rs).

Drives the session SDK (the primary surface) through the full
MongoDB-style filter grammar: equality, $in, ranges, $and/$or,
dot-notation nested paths, array-contains, plus score thresholds and
includeVectors.

Run from the repo root:  JAX_PLATFORMS=cpu python examples/search_filter.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

import numpy as np

from fabstir_vectordb_tpu.api.session import VectorDBSession

DIM = 128


def vec(i: int) -> list:
    return (np.sin(np.arange(DIM) + i) * 0.5).astype(np.float32).tolist()


def main() -> None:
    print("Filtered search walkthrough\n")
    session = VectorDBSession.create(
        {"sessionId": "example-filter", "storageMode": "mock"})

    docs = [
        ("vec-0", {"category": "technology", "published": True,
                   "views": 1500, "tags": ["ai", "ml"],
                   "author": {"name": "alice", "karma": 90}}),
        ("vec-1", {"category": "technology", "published": False,
                   "views": 300, "tags": ["db"],
                   "author": {"name": "bob", "karma": 40}}),
        ("vec-2", {"category": "science", "published": True,
                   "views": 5200, "tags": ["physics", "ai"],
                   "author": {"name": "carol", "karma": 75}}),
        ("vec-3", {"category": "sports", "published": True,
                   "views": 800, "tags": ["football"],
                   "author": {"name": "dave", "karma": 10}}),
        ("vec-4", {"category": "science", "published": False,
                   "views": 40, "tags": ["chemistry"],
                   "author": {"name": "erin", "karma": 55}}),
    ]
    session.add_vectors(
        [{"id": vid, "vector": vec(i), "metadata": meta}
         for i, (vid, meta) in enumerate(docs)])
    print(f"inserted {len(docs)} vectors\n")

    def run(label: str, filter_obj, expect: set):
        hits = session.search(vec(0), 5, {"filter": filter_obj})
        got = {h["id"] for h in hits}
        status = "ok" if got == expect else f"MISMATCH expected {expect}"
        print(f"  {label:<46} -> {sorted(got)}  [{status}]")
        assert got == expect, (label, got, expect)

    print("equality / implicit AND:")
    run('{"category": "technology"}',
        {"category": "technology"}, {"vec-0", "vec-1"})
    run('{"category": "science", "published": true}',
        {"category": "science", "published": True}, {"vec-2"})

    print("\n$in:")
    run('{"category": {"$in": ["sports", "science"]}}',
        {"category": {"$in": ["sports", "science"]}},
        {"vec-2", "vec-3", "vec-4"})

    print("\nranges:")
    run('{"views": {"$gte": 800}}',
        {"views": {"$gte": 800}}, {"vec-0", "vec-2", "vec-3"})
    run('{"views": {"$gt": 40, "$lt": 1500}}',
        {"views": {"$gt": 40, "$lt": 1500}}, {"vec-1", "vec-3"})

    print("\ncombinators:")
    run('{"$and": [{"published": true}, {"views": {"$gte": 1000}}]}',
        {"$and": [{"published": True}, {"views": {"$gte": 1000}}]},
        {"vec-0", "vec-2"})
    run('{"$or": [{"category": "sports"}, {"views": {"$lt": 100}}]}',
        {"$or": [{"category": "sports"}, {"views": {"$lt": 100}}]},
        {"vec-3", "vec-4"})

    print("\ndot-notation nested path:")
    run('{"author.karma": {"$gte": 70}}',
        {"author.karma": {"$gte": 70}}, {"vec-0", "vec-2"})

    print("\narray-contains:")
    run('{"tags": "ai"}', {"tags": "ai"}, {"vec-0", "vec-2"})

    print("\nscore threshold + includeVectors:")
    hits = session.search(vec(0), 5, {"threshold": 0.2,
                                      "includeVectors": True})
    assert all(h["score"] >= 0.2 for h in hits)
    assert all(len(h["vector"]) == DIM for h in hits)
    print(f"  {len(hits)} hit(s) above 0.2, vectors included")

    session.destroy()
    print("\nOK — filter grammar complete")


if __name__ == "__main__":
    main()
