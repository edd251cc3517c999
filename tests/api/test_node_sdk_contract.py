"""Node SDK wire contract: replays the EXACT request shapes
bindings/node/index.mjs sends, asserting the response shapes it consumes.

The test image has no Node runtime (the real `node --test` suites live in
bindings/node/test/ and bindings/js/test/ and run wherever Node >= 18
exists); this suite keeps the server side of the SDK contract pinned in CI.
Flows mirror the reference e2e suite (reference:
bindings/node/test/e2e-chunked.test.js:60-80, e2e-crud, search-filter,
delete-by-metadata, update-metadata, schema-validation, vacuum).
"""
import math

import numpy as np
import pytest

from fabstir_vectordb_tpu.api.rest import ApiConfig, create_app
from fabstir_vectordb_tpu.core import MemoryObjectStore

pytest_plugins = ("aiohttp.pytest_plugin",)

DIM = 8


@pytest.fixture
async def client(aiohttp_client):
    app = create_app(ApiConfig(session_id="node-sdk"), store=MemoryObjectStore())
    return await aiohttp_client(app)


def vec(i):
    # same deterministic generator as bindings/node/test/e2e.test.mjs
    return [math.sin(i * 37.1 + j * 11.7) for j in range(DIM)]


async def test_node_sdk_full_lifecycle(client):
    n = 200
    # addVectors -> POST /vectors/batch {vectors}
    vectors = [
        {"id": f"v{i}", "vector": vec(i),
         "metadata": {"idx": i, "cat": "even" if i % 2 == 0 else "odd",
                      "tags": [f"mod{i % 5}", "all"]}}
        for i in range(n)
    ]
    resp = await client.post("/api/v1/vectors/batch", json={"vectors": vectors})
    assert resp.status == 201
    out = await resp.json()
    assert out["inserted"] == n and out["failed"] == 0

    # search -> POST /search {vector, k, options:{score_threshold,
    # include_vectors, filter}} -> {results:[{id, score, metadata}]}
    resp = await client.post("/api/v1/search", json={"vector": vec(17), "k": 3,
                                                     "options": {}})
    results = (await resp.json())["results"]
    assert results[0]["id"] == "v17"
    assert abs(results[0]["score"] - 1.0) < 1e-6
    assert results[0]["metadata"]["idx"] == 17

    resp = await client.post(
        "/api/v1/search",
        json={"vector": vec(17), "k": 1, "options": {"include_vectors": True}},
    )
    assert len((await resp.json())["results"][0]["vector"]) == DIM

    resp = await client.post(
        "/api/v1/search",
        json={"vector": vec(17), "k": 5, "options": {"score_threshold": 0.999}},
    )
    assert all(r["score"] >= 0.999 for r in (await resp.json())["results"])

    # filters the SDK forwards verbatim
    for flt, pred in [
        ({"cat": "even"}, lambda m: m["cat"] == "even"),
        ({"idx": {"$gte": 10, "$lt": 20}}, lambda m: 10 <= m["idx"] < 20),
        ({"tags": "mod0"}, lambda m: m["idx"] % 5 == 0),
    ]:
        resp = await client.post(
            "/api/v1/search",
            json={"vector": vec(16), "k": 4, "options": {"filter": flt}},
        )
        rs = (await resp.json())["results"]
        assert rs and all(pred(r["metadata"]) for r in rs), flt

    resp = await client.post(
        "/api/v1/search",
        json={"vector": vec(16), "k": 4,
              "options": {"filter": {"$or": [{"idx": 16}, {"idx": 17}]}}},
    )
    assert sorted(r["id"] for r in (await resp.json())["results"]) == ["v16", "v17"]

    # invalid filter -> {error:{message, code}} 400
    resp = await client.post(
        "/api/v1/search",
        json={"vector": vec(0), "k": 1,
              "options": {"filter": {"idx": {"$gte": 1, "$gt": 2}}}},
    )
    assert resp.status == 400
    assert (await resp.json())["error"]["code"] == "INVALID_INPUT"

    # getVector -> GET /vectors/{id}
    resp = await client.get("/api/v1/vectors/v3")
    got = await resp.json()
    assert got["id"] == "v3" and got["metadata"]["idx"] == 3

    # updateMetadata -> PATCH /vectors/{id}/metadata {metadata}
    resp = await client.patch("/api/v1/vectors/v3/metadata",
                              json={"metadata": {"idx": 3, "cat": "patched"}})
    assert resp.status == 200
    assert (await (await client.get("/api/v1/vectors/v3")).json())[
        "metadata"]["cat"] == "patched"

    # deleteVector -> DELETE /vectors/{id}
    resp = await client.delete("/api/v1/vectors/v4")
    assert resp.status == 200
    assert (await client.get("/api/v1/vectors/v4")).status == 404

    # deleteByMetadata -> POST /vectors/delete-by-metadata {filter}
    #                  -> {deletedCount, deletedIds}
    resp = await client.post("/api/v1/vectors/delete-by-metadata",
                             json={"filter": {"cat": "odd"}})
    del_out = await resp.json()
    assert del_out["deletedCount"] == 99  # v3 was re-labeled "patched"
    assert len(del_out["deletedIds"]) == 99

    # getStats -> GET /session/stats (camelCase SessionStats)
    stats = await (await client.get("/api/v1/session/stats")).json()
    assert stats["totalDeletedCount"] == 100  # 99 odd + v4
    assert {"vectorCount", "memoryUsageMb", "indexType",
            "hnswVectorCount", "ivfVectorCount"} <= set(stats)

    # saveToS5 -> POST /session/save -> {cid}
    cid = (await (await client.post("/api/v1/session/save")).json())["cid"]
    assert cid

    # vacuum -> POST /session/vacuum -> {hnswRemoved, ivfRemoved, totalRemoved}
    vac = await (await client.post("/api/v1/session/vacuum")).json()
    assert vac["totalRemoved"] == 100

    # loadUserVectors -> POST /session/load {cid, options} -> {loaded}
    resp = await client.post("/api/v1/session/load",
                             json={"cid": cid, "options": {"lazyLoad": False}})
    assert (await resp.json())["loaded"] >= 99
    resp = await client.post("/api/v1/search", json={"vector": vec(16), "k": 1})
    assert (await resp.json())["results"][0]["id"] == "v16"


async def test_node_sdk_schema_contract(client):
    # setSchema -> PUT /session/schema {schema}
    resp = await client.put(
        "/api/v1/session/schema",
        json={"schema": {"fields": {"title": {"type": "string"}},
                         "required": ["title"]}},
    )
    assert resp.status == 200
    resp = await client.post(
        "/api/v1/vectors/batch",
        json={"vectors": [{"id": "bad", "vector": vec(1),
                           "metadata": {"nope": 1}}]},
    )
    assert resp.status == 400
    resp = await client.post(
        "/api/v1/vectors/batch",
        json={"vectors": [{"id": "ok", "vector": vec(2),
                           "metadata": {"title": "fine"}}]},
    )
    assert resp.status == 201
