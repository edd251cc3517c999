"""Mock Enhanced-S5 HTTP service (aiohttp).

Python equivalent of the reference's test S5 services
(reference: bindings/node/services/s5-http-service.js and test-s5-server/):
an in-memory (or filesystem-backed) blob service speaking the S5 path API
the storage driver expects:

    PUT    /s5/fs/{path}      store blob (honors X-S5-Encryption header
                              by recording the algorithm; a mock does not
                              actually encrypt)
    GET    /s5/fs/{path}      fetch blob (404 when missing)
    DELETE /s5/fs/{path}      delete blob
    GET    /s5/fs/{prefix}/?list=1   list keys under prefix (JSON)
    GET    /health            service health + stats

Used by integration tests to exercise S5ObjectStore end-to-end, and runnable
standalone: ``python -m fabstir_vectordb_tpu.storage.s5_service`` (env
S5_PORT, default 5522, matching the reference service's port).
"""
from __future__ import annotations

import os

from aiohttp import web


def create_s5_app() -> web.Application:
    blobs: dict[str, bytes] = {}
    encryption_seen: dict[str, str] = {}

    def _path_of(request: web.Request) -> str:
        return request.match_info["path"]

    async def put_blob(request: web.Request):
        key = _path_of(request)
        data = await request.read()
        blobs[key] = data
        algo = request.headers.get("X-S5-Encryption")
        if algo:
            encryption_seen[key] = algo
        return web.json_response({"path": key, "size": len(data)})

    async def get_blob(request: web.Request):
        key = _path_of(request)
        if request.query.get("list"):
            prefix = key.rstrip("/")
            keys = sorted(
                k for k in blobs if k.startswith(prefix + "/") or k == prefix
            )
            return web.json_response({"keys": keys})
        if key not in blobs:
            return web.json_response(
                {"error": f"not found: {key}"}, status=404
            )
        return web.Response(body=blobs[key])

    async def delete_blob(request: web.Request):
        key = _path_of(request)
        blobs.pop(key, None)
        return web.json_response({"deleted": key})

    async def health(request: web.Request):
        return web.json_response(
            {"status": "ok", "mode": "mock", "blobs": len(blobs)}
        )

    app = web.Application(client_max_size=256 * 1024 * 1024)
    app["blobs"] = blobs
    app["encryption_seen"] = encryption_seen
    app.router.add_put("/s5/fs/{path:.*}", put_blob)
    app.router.add_get("/s5/fs/{path:.*}", get_blob)
    app.router.add_delete("/s5/fs/{path:.*}", delete_blob)
    app.router.add_get("/health", health)
    return app


def main() -> None:  # pragma: no cover
    port = int(os.environ.get("S5_PORT", "5522"))
    web.run_app(create_s5_app(), port=port)


if __name__ == "__main__":  # pragma: no cover
    main()
