"""Backup management over the persistence layer.

Parity with the reference BackupManager (reference:
src/hybrid/maintenance.rs:653-799) — but functional where the reference
mocked: full backups, verification, incremental backups (unchanged chunks
skipped via content hashes), point-in-time restore from a named backup.
"""
from __future__ import annotations

import json
import time
from dataclasses import dataclass

from ..core.object_store import NotFoundError, ObjectStore
from ..index.hybrid import HybridIndex
from ..storage.persistence import HybridPersister, PersistenceError


@dataclass
class BackupRecord:
    backup_id: str
    session_id: str
    created_at: float
    n_keys: int
    incremental: bool


class BackupManager:
    """Named, timestamped backups of a session's persisted state."""

    def __init__(self, store: ObjectStore):
        self.store = store
        self.persister = HybridPersister(store)

    def _catalog_key(self, session_id: str) -> str:
        return f"backups/{session_id}/catalog.json"

    def _load_catalog(self, session_id: str) -> list:
        try:
            return json.loads(self.store.get(self._catalog_key(session_id)))
        except NotFoundError:
            return []

    def _save_catalog(self, session_id: str, catalog: list) -> None:
        self.store.put(
            self._catalog_key(session_id), json.dumps(catalog).encode()
        )

    def create_backup(
        self,
        index: HybridIndex,
        session_id: str,
        backup_id: str | None = None,
        now: float | None = None,
    ) -> BackupRecord:
        """Save the index, then snapshot all its keys under backups/."""
        now = now or time.time()
        backup_id = backup_id or f"bk-{int(now)}"
        prev = self._load_catalog(session_id)
        incremental = bool(prev)
        self.persister.save_index_chunked(
            index, session_id, incremental=incremental
        )
        keys = self.persister._session_keys(session_id)
        for key in keys:
            self.store.put(
                f"backups/{session_id}/{backup_id}/{key}", self.store.get(key)
            )
        record = BackupRecord(
            backup_id=backup_id,
            session_id=session_id,
            created_at=now,
            n_keys=len(keys),
            incremental=incremental,
        )
        prev.append(record.__dict__)
        self._save_catalog(session_id, prev)
        return record

    def list_backups(self, session_id: str) -> list:
        return [BackupRecord(**r) for r in self._load_catalog(session_id)]

    def verify_backup(self, session_id: str, backup_id: str) -> bool:
        """All keys referenced by the backed-up manifest must exist."""
        prefix = f"backups/{session_id}/{backup_id}"
        try:
            raw = self.store.get(f"{prefix}/{session_id}/manifest.json")
        except NotFoundError:
            return False
        from ..core.chunk import Manifest

        manifest = Manifest.from_json(raw.decode())
        for c in manifest.chunks:
            if not self.store.exists(
                f"{prefix}/{session_id}/chunks/{c.chunk_id}.cbor"
            ):
                return False
        return True

    def restore(self, session_id: str, backup_id: str) -> None:
        """Point-in-time restore: copy the named backup over the live keys."""
        prefix = f"backups/{session_id}/{backup_id}"
        if not self.verify_backup(session_id, backup_id):
            raise PersistenceError(
                f"backup {backup_id!r} for {session_id!r} missing or corrupt"
            )
        raw = self.store.get(f"{prefix}/{session_id}/manifest.json")
        from ..core.chunk import Manifest

        manifest = Manifest.from_json(raw.decode())
        keys = [f"{session_id}/manifest.json", f"{session_id}/state.cbor"]
        if manifest.extra.get("graph_saved"):
            keys.append(f"{session_id}/hnsw_graph.cbor")
        keys += [f"{session_id}/chunks/{c.chunk_id}.cbor" for c in manifest.chunks]
        for key in keys:
            self.store.put(key, self.store.get(f"{prefix}/{key}"))

    def load_restored(self, session_id: str):
        return self.persister.load_index_chunked(session_id)
