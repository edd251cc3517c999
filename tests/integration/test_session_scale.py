"""Session-level mid-scale e2e (mirrors the reference's primary-SDK scale
flow, reference: bindings/node/test/e2e-chunked.test.js:60-80 — 50K
add -> save -> load -> search -> destroy with memory assertions; sized to
6K/CPU so the default suite stays fast — the 100K tier lives in
test_large_scale.py)."""
import numpy as np

from fabstir_vectordb_tpu.api.session import VectorDBSession
from fabstir_vectordb_tpu.core import MemoryObjectStore

N, DIM = 6_000, 64


def test_session_mid_scale_full_lifecycle():
    store = MemoryObjectStore()
    s = VectorDBSession.create(
        {"sessionId": "scale", "storageMode": "mock", "chunkSize": 3_000},
        store,
    )
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((N, DIM)).astype(np.float32)
    for lo in range(0, N, 2_000):  # batched ingest like a real client
        s.add_vectors([
            {"id": f"d{i}", "vector": vecs[i].tolist(),
             "metadata": {"bucket": i % 7, "text": f"doc {i}"}}
            for i in range(lo, lo + 2_000)
        ])

    stats = s.get_stats()
    assert stats.vector_count == N
    # dense-array sessions must stay far under the raw-python equivalent
    assert stats.memory_usage_mb < 25, stats.memory_usage_mb

    res = s.search(vecs[4_321].tolist(), 5)
    assert res[0]["id"] == "d4321"
    res = s.search(vecs[4_321].tolist(), 5, {"filter": {"bucket": 4_321 % 7}})
    assert res[0]["id"] == "d4321"
    assert all(r["metadata"]["bucket"] == 4_321 % 7 for r in res)

    cid = s.save_to_s5()
    # chunk count parity: 6K / 3K chunkSize -> 2 chunks
    assert store.exists(f"{cid}/chunks/chunk-1.cbor")
    assert not store.exists(f"{cid}/chunks/chunk-2.cbor")
    # metadata shards: 2 shards of 3K entries
    assert store.exists(f"{cid}/metadata/meta-1.cbor")

    s2 = VectorDBSession.create(
        {"sessionId": "scale", "storageMode": "mock"}, store
    )
    s2.load_user_vectors(cid)  # lazy by default
    res = s2.search(vecs[777].tolist(), 3)
    assert res[0]["id"] == "d777"
    assert res[0]["metadata"]["text"] == "doc 777"
    res = s2.search(vecs[777].tolist(), 3, {"filter": {"bucket": 777 % 7}})
    assert res[0]["id"] == "d777"

    s2.destroy()
    s.destroy()
