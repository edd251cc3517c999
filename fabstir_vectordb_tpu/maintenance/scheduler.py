"""Background maintenance: migration scheduling, rebalancing, cleaning.

Parity with the reference maintenance layer (reference:
src/hybrid/maintenance.rs) — with real implementations where the reference
left simulated bodies:
  - ``MigrationScheduler``: policy {interval, batch size, max per run,
    quiet hours}, run_migration with per-vector error handling, continuous
    background loop, running stats (:70-475);
  - ``IndexRebalancer``: analyze_balance + rebalance via the IVF engine's
    real balance_clusters (the reference simulated values, :490-589);
  - ``IndexCleaner``: scan_for_issues / cleanup / compact over real engine
    state (the reference stubs, :606-651).
"""
from __future__ import annotations

import threading
import time
from dataclasses import dataclass

import numpy as np

from ..index.hybrid import HybridIndex
from ..utils.tracing import get_logger

log = get_logger(__name__)


@dataclass
class MigrationPolicy:
    interval_secs: float = 300.0  # 5 min
    batch_size: int = 100
    max_per_run: int = 1000
    quiet_hours: tuple | None = None  # (start_hour, end_hour) local time


@dataclass
class MigrationStats:
    runs: int = 0
    migrated_total: int = 0
    errors: int = 0
    last_run_at: float | None = None
    last_migrated: int = 0


class MigrationScheduler:
    def __init__(self, index: HybridIndex, policy: MigrationPolicy | None = None):
        self.index = index
        self.policy = policy or MigrationPolicy()
        self.stats = MigrationStats()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def in_quiet_hours(self, now: float | None = None) -> bool:
        if not self.policy.quiet_hours:
            return False
        hour = time.localtime(now or time.time()).tm_hour
        start, end = self.policy.quiet_hours
        if start <= end:
            return start <= hour < end
        return hour >= start or hour < end  # wraps midnight

    def run_migration(self, now: float | None = None) -> int:
        """One migration run: up to max_per_run vectors in policy batches."""
        if self.in_quiet_hours(now):
            return 0
        migrated = 0
        try:
            while migrated < self.policy.max_per_run:
                n = self.index.migrate_old_vectors(
                    batch_size=min(
                        self.policy.batch_size,
                        self.policy.max_per_run - migrated,
                    ),
                    now=now,
                )
                if n == 0:
                    break
                migrated += n
        except Exception as e:  # noqa: BLE001 — keep the scheduler alive
            self.stats.errors += 1
            log.warning("migration run error: %s", e)
        self.stats.runs += 1
        self.stats.migrated_total += migrated
        self.stats.last_migrated = migrated
        self.stats.last_run_at = now or time.time()
        return migrated

    def start_continuous(self) -> None:
        if self._thread is not None:
            return
        self._stop.clear()

        def loop():
            while not self._stop.wait(self.policy.interval_secs):
                self.run_migration()

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop_continuous(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=2.0)
            self._thread = None

    @property
    def running(self) -> bool:
        return self._thread is not None and self._thread.is_alive()


@dataclass
class BalanceReport:
    sizes: list
    mean_size: float
    max_size: int
    imbalance_ratio: float  # max / mean over nonempty
    empty_clusters: int

    @property
    def balanced(self) -> bool:
        return self.imbalance_ratio <= 2.0


class IndexRebalancer:
    def __init__(self, index: HybridIndex):
        self.index = index
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def analyze_balance(self) -> BalanceReport:
        stats = self.index.ivf.cluster_stats()
        sizes = np.asarray(stats.sizes)
        nonempty = sizes[sizes > 0]
        mean = float(nonempty.mean()) if nonempty.size else 0.0
        return BalanceReport(
            sizes=stats.sizes,
            mean_size=mean,
            max_size=int(sizes.max()) if sizes.size else 0,
            imbalance_ratio=float(sizes.max() / mean) if mean else 0.0,
            empty_clusters=stats.empty_clusters,
        )

    def rebalance_ivf(self, max_ratio: float = 2.0) -> int:
        if not self.index.ivf.trained:
            return 0
        return self.index.ivf.balance_clusters(max_ratio=max_ratio)

    def start_auto(self, interval_secs: float = 600.0) -> None:
        if self._thread is not None:
            return
        self._stop.clear()

        def loop():
            while not self._stop.wait(interval_secs):
                report = self.analyze_balance()
                if not report.balanced:
                    self.rebalance_ivf()

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop_auto(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=2.0)
            self._thread = None


class IndexCleaner:
    def __init__(self, index: HybridIndex):
        self.index = index

    def scan_for_issues(self) -> dict:
        """Real integrity scan: dangling graph refs + deletion backlog."""
        integrity = self.index.hnsw.check_integrity()
        deleted = self.index.store.deleted_count
        return {
            "dangling_refs": len(integrity["dangling_refs"]),
            "soft_deleted": deleted,
            "needs_vacuum": deleted > 0,
            "graph_ok": integrity["ok"],
        }

    def cleanup(self) -> dict:
        """Vacuum both engines (physical removal of soft-deleted rows)."""
        return self.index.vacuum()

    def compact(self) -> None:
        """Rebuild IVF tiles at minimal padding."""
        if self.index.ivf.trained:
            self.index.ivf.compact_clusters()
