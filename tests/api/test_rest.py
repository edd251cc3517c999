"""REST API tests via aiohttp test client (mirrors reference tests/api/rest tests)."""
import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from fabstir_vectordb_tpu.api.rest import ApiConfig, create_app
from fabstir_vectordb_tpu.core import MemoryObjectStore

pytest_plugins = ("aiohttp.pytest_plugin",)


@pytest.fixture
async def client(aiohttp_client):
    app = create_app(ApiConfig(session_id="rest-test"), store=MemoryObjectStore())
    return await aiohttp_client(app)


def vecs(n, dim=8, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, dim)).astype(float).tolist()


async def seed_data(client, n=20, dim=8):
    data = vecs(n, dim)
    payload = {
        "vectors": [
            {"id": f"v{i}", "vector": data[i], "metadata": {"i": i, "cat": "a" if i % 2 else "b"}}
            for i in range(n)
        ]
    }
    resp = await client.post("/api/v1/vectors/batch", json=payload)
    assert resp.status == 201
    return data


async def test_health(client):
    resp = await client.get("/api/v1/health")
    assert resp.status == 200
    body = await resp.json()
    assert body["status"] == "healthy"


async def test_insert_and_get(client):
    resp = await client.post(
        "/api/v1/vectors",
        json={"id": "a", "vector": [1.0] * 8, "metadata": {"x": 1}},
    )
    assert resp.status == 201
    resp = await client.get("/api/v1/vectors/a")
    assert resp.status == 200
    body = await resp.json()
    assert body["id"] == "a" and body["metadata"] == {"x": 1}
    assert len(body["vector"]) == 8


async def test_insert_requires_fields(client):
    resp = await client.post("/api/v1/vectors", json={"vector": [1.0]})
    assert resp.status == 400
    resp = await client.post("/api/v1/vectors", json={"id": "x"})
    assert resp.status == 400


async def test_get_missing_404(client):
    resp = await client.get("/api/v1/vectors/ghost")
    assert resp.status == 404


async def test_batch_partial_success(client):
    payload = {
        "vectors": [
            {"id": "ok", "vector": [0.1] * 8, "metadata": None},
            {"id": "bad", "vector": [], "metadata": None},
        ]
    }
    resp = await client.post("/api/v1/vectors/batch", json=payload)
    body = await resp.json()
    assert body["inserted"] == 1 and body["failed"] == 1


async def test_search_scores_and_threshold(client):
    data = await seed_data(client)
    resp = await client.post(
        "/api/v1/search", json={"vector": data[3], "k": 5}
    )
    body = await resp.json()
    assert body["results"][0]["id"] == "v3"
    assert body["results"][0]["score"] > 0.99
    # high threshold filters out weaker matches
    resp = await client.post(
        "/api/v1/search",
        json={"vector": data[3], "k": 5, "options": {"score_threshold": 0.99}},
    )
    body = await resp.json()
    assert body["count"] == 1


async def test_search_with_filter(client):
    data = await seed_data(client)
    resp = await client.post(
        "/api/v1/search",
        json={"vector": data[0], "k": 5, "options": {"filter": {"cat": "a"}}},
    )
    body = await resp.json()
    assert body["count"] > 0
    for r in body["results"]:
        assert r["metadata"]["cat"] == "a"


async def test_delete(client):
    data = await seed_data(client)
    resp = await client.delete("/api/v1/vectors/v3")
    assert resp.status == 200
    resp = await client.post("/api/v1/search", json={"vector": data[3], "k": 20})
    body = await resp.json()
    assert all(r["id"] != "v3" for r in body["results"])
    resp = await client.delete("/api/v1/vectors/v3")
    assert resp.status == 404


async def test_statistics(client):
    await seed_data(client)
    resp = await client.get("/api/v1/admin/statistics")
    body = await resp.json()
    assert body["initialized"]
    assert body["index"]["vectorCount"] == 20


async def test_metrics_before_initialization(client):
    """/metrics must serve (build info + stream/coalescer counters) even
    before the first vector initializes the index."""
    resp = await client.get("/metrics")
    assert resp.status == 200
    text = await resp.text()
    assert 'fvdb_build_info{version="' in text
    assert "fvdb_stream_subscribers 0" in text
    assert "fvdb_vectors" not in text  # no index yet


async def test_metrics_prometheus_exposition(client):
    """/metrics serves Prometheus text format with the live counters
    (beyond reference parity: the reference has no Prometheus surface)."""
    await seed_data(client)
    # drive one search so latency quantiles exist
    resp = await client.post(
        "/api/v1/search", json={"vector": vecs(1)[0], "k": 3})
    assert resp.status == 200
    resp = await client.get("/metrics")
    assert resp.status == 200
    assert resp.content_type == "text/plain"
    text = await resp.text()
    assert 'fvdb_build_info{version="' in text
    assert 'fvdb_vectors{index="hnsw"}' in text
    assert "fvdb_searches_total 1" in text
    assert 'fvdb_search_latency_ms{quantile="0.5"}' in text
    assert 'fvdb_serving_regime_info{regime="' in text
    # every non-comment line is "name{labels} value" parseable
    for line in text.splitlines():
        if line.startswith("#") or not line:
            continue
        name_part, value = line.rsplit(" ", 1)
        float(value)
        assert name_part.startswith("fvdb_")


async def test_admin_migrate_and_rebalance(client):
    await seed_data(client)
    resp = await client.post("/api/v1/admin/migrate")
    assert resp.status == 200
    resp = await client.post("/api/v1/admin/rebalance")
    body = await resp.json()
    assert resp.status == 200
    assert "moved" in body


async def test_admin_backup(client):
    await seed_data(client)
    resp = await client.post("/api/v1/admin/backup")
    assert resp.status == 200
    body = await resp.json()
    assert body["backup"] == "rest-test"


async def test_cors_headers(client):
    resp = await client.get("/api/v1/health")
    assert resp.headers["Access-Control-Allow-Origin"] == "*"


async def test_sse_stream_receives_updates(client):
    resp = await client.get("/api/v1/stream/updates")
    assert resp.status == 200
    await client.post(
        "/api/v1/vectors", json={"id": "sse1", "vector": [0.5] * 8}
    )
    line = b""
    while not line.startswith(b"data: "):
        line = await resp.content.readline()
    import json as _json

    event = _json.loads(line[6:].decode())
    assert event == {"type": "insert", "id": "sse1"}
    resp.close()


async def test_websocket_updates(client):
    ws = await client.ws_connect("/api/v1/ws")
    await ws.send_str("ping")
    msg = await ws.receive_str()
    assert msg == "pong"
    await client.post("/api/v1/vectors", json={"id": "w1", "vector": [0.1] * 8})
    event = await ws.receive_json()
    assert event["type"] == "insert" and event["id"] == "w1"
    await ws.close()


async def test_malformed_json_returns_400_envelope(client):
    """Error-shaping middleware: bad JSON bodies get the standard error
    envelope as 400, never a raw 500 (clients retry 5xx)."""
    for body in (b"{nope", b""):
        resp = await client.post(
            "/api/v1/search", data=body,
            headers={"Content-Type": "application/json"},
        )
        assert resp.status == 400
        payload = await resp.json()
        assert payload["error"]["code"] == "INVALID_INPUT"
        assert "JSON" in payload["error"]["message"]


async def test_session_routes_full_lifecycle(client):
    """Session-level routes the Node SDK depends on: schema -> insert ->
    update-metadata -> delete-by-metadata -> vacuum -> save -> load -> stats."""
    # schema
    resp = await client.put("/api/v1/session/schema", json={
        "schema": {"fields": {"cat": {"type": "string"}}, "required": ["cat"]}
    })
    assert resp.status == 200

    data = vecs(12)
    payload = {"vectors": [
        {"id": f"s{i}", "vector": data[i], "metadata": {"cat": "a" if i < 6 else "b"}}
        for i in range(12)
    ]}
    resp = await client.post("/api/v1/vectors/batch", json=payload)
    assert resp.status == 201

    # schema violation rejected
    resp = await client.post("/api/v1/vectors", json={
        "id": "bad", "vector": data[0], "metadata": {"nope": 1}})
    assert resp.status == 400

    # update metadata
    resp = await client.patch("/api/v1/vectors/s0/metadata",
                              json={"metadata": {"cat": "c"}})
    assert resp.status == 200
    resp = await client.get("/api/v1/vectors/s0")
    assert (await resp.json())["metadata"]["cat"] == "c"
    # unknown id -> error envelope
    resp = await client.patch("/api/v1/vectors/ghost/metadata",
                              json={"metadata": {"cat": "c"}})
    assert resp.status == 400
    assert (await resp.json())["error"]["code"] == "INVALID_INPUT"

    # delete by metadata
    resp = await client.post("/api/v1/vectors/delete-by-metadata",
                             json={"filter": {"cat": "b"}})
    body = await resp.json()
    assert resp.status == 200 and body["deletedCount"] == 6
    assert set(body["deletedIds"]) == {f"s{i}" for i in range(6, 12)}

    # vacuum removes soft-deleted
    resp = await client.post("/api/v1/session/vacuum")
    body = await resp.json()
    assert resp.status == 200 and body["totalRemoved"] == 6

    # save -> returns cid
    resp = await client.post("/api/v1/session/save")
    body = await resp.json()
    assert resp.status == 200 and body["cid"]

    # load the saved cid back
    resp = await client.post("/api/v1/session/load", json={"cid": body["cid"]})
    body = await resp.json()
    assert resp.status == 200 and body["loaded"] == 6

    # stats
    resp = await client.get("/api/v1/session/stats")
    body = await resp.json()
    assert resp.status == 200
    assert body["vectorCount"] == 6
    assert body["totalDeletedCount"] == 0

    # load with missing cid -> 400
    resp = await client.post("/api/v1/session/load", json={})
    assert resp.status == 400


async def test_concurrent_searches_coalesce_into_batches(client):
    """Micro-batching: concurrent /search requests share device dispatches
    (round-1 verdict item 4: QPS must scale beyond 1/p50)."""
    import asyncio

    data = await seed_data(client, n=64)
    # warm one search so the engine state is resident
    resp = await client.post("/api/v1/search", json={"vector": data[0], "k": 3})
    assert resp.status == 200

    state = client.server.app["state"]
    req0, disp0 = state.coalescer.requests, state.coalescer.dispatches

    async def one(i):
        r = await client.post("/api/v1/search", json={"vector": data[i], "k": 3})
        assert r.status == 200
        body = await r.json()
        assert body["results"][0]["id"] == f"v{i}"

    await asyncio.gather(*(one(i) for i in range(32)))
    reqs = state.coalescer.requests - req0
    disps = state.coalescer.dispatches - disp0
    assert reqs == 32
    assert disps < reqs, f"no coalescing happened ({disps} dispatches)"


async def test_coalesced_searches_respect_per_request_options(client):
    import asyncio

    data = await seed_data(client, n=32)

    async def filtered(cat):
        r = await client.post(
            "/api/v1/search",
            json={"vector": data[1], "k": 4, "options": {"filter": {"cat": cat}}},
        )
        body = await r.json()
        return [x["metadata"]["cat"] for x in body["results"]]

    async def thresholded():
        r = await client.post(
            "/api/v1/search",
            json={"vector": data[1], "k": 4,
                  "options": {"score_threshold": 0.999}},
        )
        body = await r.json()
        return body["results"]

    cats_a, cats_b, thr = await asyncio.gather(
        filtered("a"), filtered("b"), thresholded()
    )
    assert set(cats_a) == {"a"} and set(cats_b) == {"b"}
    assert all(x["score"] >= 0.999 for x in thr)
    assert thr and thr[0]["id"] == "v1"


async def test_include_vectors_via_coalescer(client):
    data = await seed_data(client, n=8)
    resp = await client.post(
        "/api/v1/search",
        json={"vector": data[2], "k": 1, "options": {"include_vectors": True}},
    )
    body = await resp.json()
    assert body["results"][0]["id"] == "v2"
    assert np.allclose(body["results"][0]["vector"], data[2], atol=1e-5)


async def test_insert_persists_vector_to_storage(client):
    """Reference insert handler persists each vector to storage and GET
    falls back there when not in memory (rest.rs:392-447, :533-570)."""
    from fabstir_vectordb_tpu import cbor

    store = client.server.app["state"].store
    resp = await client.post(
        "/api/v1/vectors",
        json={"id": "dur", "vector": [1.0] * 8, "metadata": {"x": 1}},
    )
    assert resp.status == 201
    key = "rest-test/vectors/dur.cbor"
    assert store.exists(key)
    obj = cbor.loads(store.get(key))
    assert obj["id"] == "dur" and obj["metadata"] == {"x": 1}

    # delete removes the storage copy too
    await client.delete("/api/v1/vectors/dur")
    assert not store.exists(key)


async def test_get_falls_back_to_storage(client):
    from fabstir_vectordb_tpu import cbor

    store = client.server.app["state"].store
    store.put("rest-test/vectors/ghost.cbor", cbor.dumps(
        {"id": "ghost", "vector": [0.5] * 8, "metadata": {"m": 2}}
    ))
    resp = await client.get("/api/v1/vectors/ghost")
    assert resp.status == 200
    body = await resp.json()
    assert body["source"] == "storage" and body["metadata"] == {"m": 2}


async def test_batch_insert_persists_all(client):
    store = client.server.app["state"].store
    await seed_data(client, n=12)
    for i in range(12):
        assert store.exists(f"rest-test/vectors/v{i}.cbor")


async def test_coalesced_searches_through_reduced_rank_regime(
        aiohttp_client, monkeypatch):
    """Concurrent /search correctness when the serving regime is the PCA
    stage-1 + host-rerank path: the coalescer batches queries, the fused
    dispatch returns a post-rerank closure, and every request must still
    get ITS OWN top hit."""
    import asyncio

    from fabstir_vectordb_tpu.utils import limits

    monkeypatch.setattr(limits, "FLAT_THRESHOLD", 0)
    monkeypatch.setenv("FVDB_FLAT_THRESHOLD", "0")
    monkeypatch.setenv("FVDB_PCA_RANK", "8")
    app = create_app(ApiConfig(session_id="rest-pca"),
                     store=MemoryObjectStore())
    client = await aiohttp_client(app)
    data = await seed_data(client, n=64)
    resp = await client.post("/api/v1/search",
                             json={"vector": data[0], "k": 3})
    assert resp.status == 200

    async def one(i):
        r = await client.post("/api/v1/search",
                              json={"vector": data[i], "k": 3})
        assert r.status == 200
        body = await r.json()
        assert body["results"][0]["id"] == f"v{i}"
        assert body["results"][0]["score"] > 0.999  # exact rerank distance

    await asyncio.gather(*(one(i) for i in range(32)))


async def test_statistics_reports_serving_regime(aiohttp_client, monkeypatch):
    from fabstir_vectordb_tpu.utils import limits

    app = create_app(ApiConfig(session_id="rest-regime"),
                     store=MemoryObjectStore())
    client = await aiohttp_client(app)
    await seed_data(client, n=8)
    body = await (await client.get("/api/v1/admin/statistics")).json()
    assert body["serving"]["regime"] == "flat-exact"
    assert body["serving"]["serving_dtype"] in ("float32", "bfloat16")

    monkeypatch.setattr(limits, "FLAT_THRESHOLD", 0)
    monkeypatch.setenv("FVDB_FLAT_THRESHOLD", "0")
    body = await (await client.get("/api/v1/admin/statistics")).json()
    assert body["serving"]["regime"] == "reduced-rank"
    assert "pca_rank" in body["serving"]

    monkeypatch.setenv("FVDB_PCA_SERVE", "0")
    body = await (await client.get("/api/v1/admin/statistics")).json()
    assert body["serving"]["regime"] == "pruned"


async def test_malformed_query_does_not_poison_coalesced_batch(client):
    """One wrong-dim/non-numeric query must fail ALONE: grouped dispatch
    previously fanned its error to every request coalesced with it."""
    import asyncio

    data = await seed_data(client, n=16)
    await client.post("/api/v1/search", json={"vector": data[0], "k": 3})

    async def good(i):
        r = await client.post("/api/v1/search",
                              json={"vector": data[i], "k": 3})
        return r.status

    async def bad(payload):
        r = await client.post("/api/v1/search",
                              json={"vector": payload, "k": 3})
        return r.status

    statuses = await asyncio.gather(
        *([good(i) for i in range(10)]
          + [bad([1.0, 2.0]), bad([1.0, "x"] + [0.0] * 6)]))
    assert statuses[:10] == [200] * 10
    assert statuses[10] == 400 and statuses[11] == 400
