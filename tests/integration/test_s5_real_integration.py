"""Real-portal S5 tier (mirrors reference tests/test_s5_real_integration.rs).

Two layers:

- Default suite: the real-mode *proxy* service is exercised against the
  mock service acting as the portal (mock-as-portal) — proving the proxy
  forwards method/body/encryption-header/list faithfully and surfaces
  portal failures as 502s, without any network egress.

- Gated tier (``STORAGE_MODE=real`` + ``S5_PORTAL_URL``): the same
  workload against a live portal, skipped by default exactly like the
  reference's ``STORAGE_MODE=real cargo test --ignored`` tier
  (reference README.md:245). Invocation:

      STORAGE_MODE=real S5_PORTAL_URL=http://localhost:5522 \
          python -m pytest tests/integration/test_s5_real_integration.py -q
"""
from __future__ import annotations

import asyncio
import os
import threading

import pytest
from aiohttp.test_utils import TestServer

from fabstir_vectordb_tpu.core.object_store import NotFoundError, StorageError
from fabstir_vectordb_tpu.storage.s5 import S5ObjectStore
from fabstir_vectordb_tpu.storage.s5_service import (
    create_s5_app,
    create_s5_proxy_app,
)


class _AppThread:
    """Run an aiohttp app in a background thread with its own loop."""

    def __init__(self, app):
        self.app = app
        self._started = threading.Event()
        self._loop = None
        self.url = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        assert self._started.wait(10)

    def _run(self):
        self._loop = asyncio.new_event_loop()
        asyncio.set_event_loop(self._loop)
        server = TestServer(self.app)
        self._loop.run_until_complete(server.start_server())
        self.url = str(server.make_url("")).rstrip("/")
        self._started.set()
        self._loop.run_forever()

    def stop(self):
        self._loop.call_soon_threadsafe(self._loop.stop)


@pytest.fixture
def proxy_over_mock():
    """mock portal <- real-mode proxy; yields (proxy_url, portal_app)."""
    portal = _AppThread(create_s5_app())
    proxy = _AppThread(create_s5_proxy_app(portal.url, timeout=5))
    yield proxy.url, portal.app
    proxy.stop()
    portal.stop()


def _workload(store: S5ObjectStore):
    """The reference real-integration workload: CRUD + list + overwrite
    (test_s5_real_integration.rs shape) through whatever service backs
    ``store``."""
    blob = bytes(range(256)) * 64  # 16 KiB
    store.put("real/chunks/chunk-0.cbor", blob)
    store.put("real/manifest.json", b'{"version": 3}')
    assert store.get("real/chunks/chunk-0.cbor") == blob
    assert store.exists("real/manifest.json")
    keys = store.list_keys("real")
    assert "real/chunks/chunk-0.cbor" in keys
    assert "real/manifest.json" in keys
    # overwrite (S5 fs paths are mutable through the portal's fs API)
    store.put("real/manifest.json", b'{"version": 3, "n": 1}')
    store._cache.clear()
    assert store.get("real/manifest.json") == b'{"version": 3, "n": 1}'
    store.delete("real/chunks/chunk-0.cbor")
    store._cache.clear()
    with pytest.raises(NotFoundError):
        store.get("real/chunks/chunk-0.cbor")


class TestProxyOverMockPortal:
    def test_crud_through_proxy(self, proxy_over_mock):
        url, portal_app = proxy_over_mock
        _workload(S5ObjectStore(url, timeout=5))
        # blobs physically landed in the portal, not the proxy
        assert "real/manifest.json" in portal_app["blobs"]

    def test_encryption_header_reaches_portal(self, proxy_over_mock):
        url, portal_app = proxy_over_mock
        store = S5ObjectStore(url, timeout=5, encrypt_at_rest=True)
        store.put("real/enc.bin", b"secret")
        assert portal_app["encryption_seen"]["real/enc.bin"] == \
            "xchacha20-poly1305"

    def test_health_reports_real_mode_and_upstream(self, proxy_over_mock):
        import urllib.request
        url, _ = proxy_over_mock
        with urllib.request.urlopen(url + "/health", timeout=5) as r:
            import json
            h = json.loads(r.read())
        assert h["mode"] == "real"
        assert h["upstream"] == "ok"

    def test_portal_down_surfaces_502(self):
        proxy = _AppThread(
            create_s5_proxy_app("http://127.0.0.1:1", timeout=2))
        try:
            store = S5ObjectStore(proxy.url, timeout=5, retries=1)
            with pytest.raises(StorageError):
                store.put("x", b"y")
            import json
            import urllib.request
            with urllib.request.urlopen(proxy.url + "/health", timeout=5) as r:
                assert json.loads(r.read())["upstream"] == "unreachable"
        finally:
            proxy.stop()


REAL = os.environ.get("STORAGE_MODE", "").lower() == "real"


@pytest.mark.skipif(
    not REAL, reason="gated: STORAGE_MODE=real + S5_PORTAL_URL required"
)
class TestRealPortal:
    """Live-network tier (reference test_s5_real_integration.rs)."""

    def test_real_portal_roundtrip(self):
        portal = os.environ.get("S5_PORTAL_URL")
        assert portal, "STORAGE_MODE=real requires S5_PORTAL_URL"
        timeout = float(os.environ.get("S5_CONNECTION_TIMEOUT", "30"))
        _workload(S5ObjectStore(portal, timeout=timeout))
