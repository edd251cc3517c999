"""SSE/WS mutation-feed durability (VERDICT r2 weak #8).

The reference stubs these endpoints (reference: src/api/rest.rs:679-738),
so this build defines — and pins — the contract:

- a client disconnect mid-stream unsubscribes its queue (no leak, no
  effect on other subscribers);
- a slow consumer overflows its own 256-deep queue only: events drop for
  IT alone and its next delivered message is preceded by
  ``{"type": "lagged", "dropped": N}``;
- under concurrent mutation, a fast consumer receives every event
  exactly once.
"""
import asyncio
import json

import pytest

from fabstir_vectordb_tpu.api.rest import ApiConfig, create_app
from fabstir_vectordb_tpu.core import MemoryObjectStore

pytest_plugins = ("aiohttp.pytest_plugin",)

DIM = 8


@pytest.fixture
async def client(aiohttp_client):
    app = create_app(ApiConfig(session_id="stream-test"),
                     store=MemoryObjectStore())
    return await aiohttp_client(app)


def _vec(i):
    return [float(i)] * DIM


async def _insert(client, vid):
    resp = await client.post(
        "/api/v1/vectors",
        json={"id": vid, "vector": _vec(1), "metadata": None})
    assert resp.status == 201


async def _subscribers(client) -> int:
    resp = await client.get("/api/v1/admin/statistics")
    body = await resp.json()
    return body.get("stream", {}).get("subscribers", 0)


async def _read_sse_events(resp, n, timeout=10):
    """Read n SSE data frames from a streaming response."""
    events = []
    buf = b""
    async def _reader():
        nonlocal buf
        while len(events) < n:
            chunk = await resp.content.read(4096)
            if not chunk:
                break
            buf += chunk
            while b"\n\n" in buf:
                frame, buf = buf.split(b"\n\n", 1)
                if frame.startswith(b"data: "):
                    events.append(json.loads(frame[6:]))
    await asyncio.wait_for(_reader(), timeout)
    return events


async def test_sse_disconnect_mid_stream_unsubscribes(client):
    await _insert(client, "seed")
    assert await _subscribers(client) == 0
    resp = await client.get("/api/v1/stream/updates")
    # subscription registers synchronously with stream start
    for _ in range(50):
        if await _subscribers(client) == 1:
            break
        await asyncio.sleep(0.05)
    assert await _subscribers(client) == 1

    await _insert(client, "a")
    events = await _read_sse_events(resp, 1)
    assert events[0] == {"type": "insert", "id": "a"}

    # hard-close the connection mid-stream
    resp.close()
    # the server notices on its next write: publish events until cleaned up
    for i in range(100):
        await _insert(client, f"post-close-{i}")
        if await _subscribers(client) == 0:
            break
        await asyncio.sleep(0.02)
    assert await _subscribers(client) == 0


async def test_ws_disconnect_mid_stream_unsubscribes(client):
    ws = await client.ws_connect("/api/v1/ws")
    for _ in range(50):
        if await _subscribers(client) == 1:
            break
        await asyncio.sleep(0.05)
    assert await _subscribers(client) == 1

    await _insert(client, "w1")
    msg = await asyncio.wait_for(ws.receive_json(), 10)
    assert msg == {"type": "insert", "id": "w1"}

    await ws.close()
    for _ in range(100):
        if await _subscribers(client) == 0:
            break
        await asyncio.sleep(0.02)
    assert await _subscribers(client) == 0


async def test_slow_consumer_gets_lagged_marker_not_silent_loss(client):
    """Overflow a subscriber's queue (depth 256) without reading, then
    read: the stream must deliver a lagged marker counting the drops, and
    stay connected."""
    from fabstir_vectordb_tpu.api.rest import _Subscriber

    app_state = client.server.app["state"]
    sub = _Subscriber()
    app_state.subscribers.append(sub)
    try:
        n_events = 300  # > queue depth 256
        for i in range(n_events):
            app_state.publish({"type": "insert", "id": f"e{i}"})
        assert sub.queue.qsize() == 256
        assert sub.dropped == n_events - 256

        # pre-gap events deliver first, in order — the marker sits AT the
        # gap (a resyncing client must not replay stale pre-gap mutations
        # over its fresh snapshot)
        first = await sub.next_events()
        assert first == [{"type": "insert", "id": "e0"}]
        for i in range(1, 256):
            got = await sub.next_events()
            assert got == [{"type": "insert", "id": f"e{i}"}]
        marker = await sub.next_events()
        assert marker == [{"type": "lagged", "dropped": n_events - 256}]
        # a post-gap event flows normally, no repeated marker
        app_state.publish({"type": "insert", "id": "post"})
        nxt = await sub.next_events()
        assert nxt == [{"type": "insert", "id": "post"}]

        # and when a post-gap event arrives BEFORE the consumer drains,
        # publish() itself closes the gap in-queue at the right position
        sub2 = _Subscriber()
        sub2.queue = __import__("asyncio").Queue(maxsize=2)
        app_state.subscribers.append(sub2)
        try:
            for i in range(4):  # q0, q1 queued; q2, q3 dropped
                app_state.publish({"type": "insert", "id": f"q{i}"})
            assert (await sub2.next_events()) == [
                {"type": "insert", "id": "q0"}]
            assert (await sub2.next_events()) == [
                {"type": "insert", "id": "q1"}]
            app_state.publish({"type": "insert", "id": "q4"})  # post-gap
            assert (await sub2.next_events()) == [
                {"type": "lagged", "dropped": 2}]
            assert (await sub2.next_events()) == [
                {"type": "insert", "id": "q4"}]
        finally:
            app_state.subscribers.remove(sub2)
    finally:
        app_state.subscribers.remove(sub)


async def test_slow_consumer_does_not_affect_fast_consumer(client):
    from fabstir_vectordb_tpu.api.rest import _Subscriber

    app_state = client.server.app["state"]
    slow = _Subscriber()
    slow.queue = asyncio.Queue(maxsize=4)  # tiny buffer, never read
    app_state.subscribers.append(slow)
    try:
        ws = await client.ws_connect("/api/v1/ws")
        for _ in range(50):
            if await _subscribers(client) == 2:
                break
            await asyncio.sleep(0.05)
        # overflow the slow one (burst stays under the fast queue's 256)
        for i in range(200):
            app_state.publish({"type": "insert", "id": f"x{i}"})
        assert slow.dropped > 0
        # the fast ws consumer still gets a real mutation event promptly
        await _insert(client, "fast-ok")
        seen = []
        for _ in range(500):
            msg = await asyncio.wait_for(ws.receive_json(), 10)
            seen.append(msg)
            if msg == {"type": "insert", "id": "fast-ok"}:
                break
        assert {"type": "insert", "id": "fast-ok"} in seen
        assert not any(m.get("type") == "lagged" for m in seen)
        await ws.close()
    finally:
        app_state.subscribers.remove(slow)


async def test_no_event_loss_under_concurrent_mutation(client):
    """Concurrent inserts + deletes while one consumer reads: every
    mutation appears exactly once, no lagged marker (well under queue
    depth)."""
    ws = await client.ws_connect("/api/v1/ws")
    for _ in range(50):
        if await _subscribers(client) == 1:
            break
        await asyncio.sleep(0.05)

    n_tasks, per_task = 4, 10

    async def mutate(t):
        for i in range(per_task):
            await _insert(client, f"t{t}-{i}")

    await asyncio.gather(*(mutate(t) for t in range(n_tasks)))
    # plus deletes interleaved after
    for t in range(n_tasks):
        resp = await client.delete(f"/api/v1/vectors/t{t}-0")
        assert resp.status == 200

    want_inserts = {f"t{t}-{i}" for t in range(n_tasks)
                    for i in range(per_task)}
    want_deletes = {f"t{t}-0" for t in range(n_tasks)}
    got_inserts, got_deletes, others = [], [], []
    total = len(want_inserts) + len(want_deletes)
    for _ in range(total):
        msg = await asyncio.wait_for(ws.receive_json(), 10)
        if msg.get("type") == "insert":
            got_inserts.append(msg["id"])
        elif msg.get("type") == "delete":
            got_deletes.append(msg["id"])
        else:
            others.append(msg)
    assert sorted(got_inserts) == sorted(want_inserts)  # exactly once each
    assert sorted(got_deletes) == sorted(want_deletes)
    assert not others
    await ws.close()
