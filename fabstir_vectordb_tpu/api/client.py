"""REST client with fluent SearchBuilder and retry.

Parity with the reference clients (reference: src/client/rust.rs and
bindings/js/src/client.ts): health/insert/get/update/delete/batch/search/
statistics/migrate/rebalance/backup, fluent ``SearchBuilder`` (k / filter /
score_threshold / include_vectors, rust.rs:121-222), retry with backoff
(rust.rs:566-594; exponential like the TS client, client.ts:46-72), and an
SSE ``subscribe_updates`` generator (client.ts:130-160).
"""
from __future__ import annotations

import json
import time
from typing import Any

import requests


class ClientError(RuntimeError):
    def __init__(self, message: str, status: int | None = None):
        super().__init__(message)
        self.status = status


class VectorDbClient:
    def __init__(
        self,
        base_url: str = "http://localhost:8080",
        timeout: float = 30.0,
        max_retries: int = 3,
        backoff: float = 0.25,
        session=None,
    ):
        self.base_url = base_url.rstrip("/") + "/api/v1"
        self.timeout = timeout
        self.max_retries = max_retries
        self.backoff = backoff
        self._session = session or requests.Session()

    def _request(self, method: str, path: str, body: Any = None):
        last: Exception | None = None
        for attempt in range(self.max_retries + 1):
            try:
                resp = self._session.request(
                    method,
                    f"{self.base_url}{path}",
                    json=body,
                    timeout=self.timeout,
                )
                if resp.status_code >= 500 and attempt < self.max_retries:
                    raise ClientError(resp.text, resp.status_code)
                if resp.status_code >= 400:
                    try:
                        err = resp.json().get("error", {})
                        msg = err.get("message", resp.text)
                    except Exception:
                        msg = resp.text
                    raise _NoRetry(msg, resp.status_code)
                return resp.json()
            except _NoRetry as e:
                raise ClientError(str(e), e.status) from None
            except Exception as e:  # noqa: BLE001
                last = e
                if attempt < self.max_retries:
                    time.sleep(min(self.backoff * (2 ** attempt), 10.0))
        raise ClientError(f"request failed after retries: {last}")

    # ----------------------------------------------------------- endpoints
    def health(self) -> dict:
        return self._request("GET", "/health")

    def insert(self, vid: str, vector: list, metadata: Any = None) -> dict:
        return self._request(
            "POST", "/vectors", {"id": vid, "vector": vector, "metadata": metadata}
        )

    def insert_batch(self, vectors: list) -> dict:
        return self._request("POST", "/vectors/batch", {"vectors": vectors})

    def get(self, vid: str) -> dict:
        return self._request("GET", f"/vectors/{vid}")

    def update(self, vid: str, vector: list, metadata: Any = None) -> dict:
        # update == delete + insert in the reference client (rust.rs "update(=insert)")
        try:
            self.delete(vid)
        except ClientError:
            pass
        return self.insert(vid, vector, metadata)

    def delete(self, vid: str) -> dict:
        return self._request("DELETE", f"/vectors/{vid}")

    def search(self, vector: list, k: int = 10, **options) -> list:
        body = {"vector": vector, "k": k}
        if options:
            body["options"] = options
        return self._request("POST", "/search", body)["results"]

    def search_builder(self, vector: list) -> "SearchBuilder":
        return SearchBuilder(self, vector)

    def statistics(self) -> dict:
        return self._request("GET", "/admin/statistics")

    def migrate(self) -> dict:
        return self._request("POST", "/admin/migrate")

    def rebalance(self) -> dict:
        return self._request("POST", "/admin/rebalance")

    def backup(self, backup_path: str | None = None,
               compress: bool = False) -> dict:
        body = None
        if backup_path is not None or compress:
            body = {"backup_path": backup_path or "backup",
                    "compress": compress}
        return self._request("POST", "/admin/backup", body)

    def create_backup(self, path: str = "backup") -> "BackupBuilder":
        """Fluent backup builder (parity: rust.rs:224-264,558-564)."""
        return BackupBuilder(self, path)

    # ------------------------------------------------ session-level routes
    def delete_by_metadata(self, flt: Any) -> dict:
        return self._request(
            "POST", "/vectors/delete-by-metadata", {"filter": flt}
        )

    def update_metadata(self, vid: str, metadata: Any) -> dict:
        return self._request(
            "PATCH", f"/vectors/{vid}/metadata", {"metadata": metadata}
        )

    def save_session(self) -> str:
        return self._request("POST", "/session/save")["cid"]

    def load_session(self, cid: str, options: dict | None = None) -> dict:
        return self._request(
            "POST", "/session/load", {"cid": cid, "options": options}
        )

    def set_schema(self, schema: Any) -> dict:
        return self._request("PUT", "/session/schema", {"schema": schema})

    def vacuum(self) -> dict:
        return self._request("POST", "/session/vacuum")

    def session_stats(self) -> dict:
        return self._request("GET", "/session/stats")

    def subscribe_updates(self):
        """Yields server-sent events as dicts (blocking generator)."""
        resp = self._session.get(
            f"{self.base_url}/stream/updates", stream=True, timeout=None
        )
        for line in resp.iter_lines():
            if line.startswith(b"data: "):
                yield json.loads(line[6:].decode())


class _NoRetry(ClientError):
    pass


class SearchBuilder:
    """Fluent search options builder (parity: rust.rs:121-222)."""

    def __init__(self, client: VectorDbClient, vector: list):
        self._client = client
        self._vector = vector
        self._k = 10
        self._options: dict = {}

    def k(self, k: int) -> "SearchBuilder":
        self._k = k
        return self

    def filter(self, flt: Any) -> "SearchBuilder":
        self._options["filter"] = flt
        return self

    def score_threshold(self, t: float) -> "SearchBuilder":
        self._options["score_threshold"] = t
        return self

    def include_vectors(self, yes: bool = True) -> "SearchBuilder":
        self._options["include_vectors"] = yes
        return self

    def execute(self) -> list:
        return self._client.search(self._vector, self._k, **self._options)


class BackupBuilder:
    """Fluent backup builder (parity: rust.rs:224-264)."""

    def __init__(self, client: VectorDbClient, path: str = "backup"):
        self._client = client
        self._path = path
        self._compressed = False

    def compressed(self, yes: bool = True) -> "BackupBuilder":
        self._compressed = yes
        return self

    def execute(self) -> dict:
        return self._client.backup(self._path, self._compressed)
