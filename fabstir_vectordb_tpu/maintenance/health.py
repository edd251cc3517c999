"""Health monitoring with thresholds and alert handlers.

Parity with the reference HealthMonitor (reference:
src/hybrid/maintenance.rs:801-868): thresholds {migration backlog, search
latency, memory}, Healthy/Warning/Critical reports, pluggable alert
handlers, periodic background checks.
"""
from __future__ import annotations

import threading
import time
from dataclasses import dataclass


from ..index.hybrid import HybridIndex
from ..utils.tracing import PerfMonitor, get_logger

log = get_logger(__name__)

HEALTHY = "healthy"
WARNING = "warning"
CRITICAL = "critical"


@dataclass
class HealthThresholds:
    max_migration_backlog: int = 1000
    max_latency_ms: float = 100.0
    max_memory_bytes: int = 1 << 30  # 1 GB
    max_deleted_fraction: float = 0.25


@dataclass
class HealthReport:
    status: str
    checks: dict
    at: float

    @property
    def healthy(self) -> bool:
        return self.status == HEALTHY


class HealthMonitor:
    def __init__(
        self,
        index: HybridIndex,
        thresholds: HealthThresholds | None = None,
        monitor: PerfMonitor | None = None,
    ):
        self.index = index
        self.thresholds = thresholds or HealthThresholds()
        self.perf = monitor or PerfMonitor()
        self.alert_handlers: list = []
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def on_alert(self, handler) -> None:
        """handler(report: HealthReport) called on WARNING/CRITICAL."""
        self.alert_handlers.append(handler)

    def migration_backlog(self, now: float | None = None) -> int:
        now = now or time.time()
        s = self.index.store
        m = self.index.hnsw.member_mask()[: s.count]
        act = ~s.deleted[: s.count]
        age = now - s.timestamps[: s.count]
        return int(
            (m & act & (age >= self.index.config.recent_threshold_secs)).sum()
        )

    def check(self, now: float | None = None) -> HealthReport:
        now = now or time.time()
        t = self.thresholds
        backlog = self.migration_backlog(now)
        mem = self.index.memory_usage_bytes()
        perf = self.perf.stats()
        latency = perf["p99_ms"]
        total = max(self.index.store.count, 1)
        deleted_frac = self.index.store.deleted_count / total

        checks = {
            "migration_backlog": {
                "value": backlog,
                "limit": t.max_migration_backlog,
                "ok": backlog <= t.max_migration_backlog,
            },
            "search_latency_p99_ms": {
                "value": latency,
                "limit": t.max_latency_ms,
                "ok": latency <= t.max_latency_ms,
            },
            "memory_bytes": {
                "value": mem,
                "limit": t.max_memory_bytes,
                "ok": mem <= t.max_memory_bytes,
            },
            "deleted_fraction": {
                "value": deleted_frac,
                "limit": t.max_deleted_fraction,
                "ok": deleted_frac <= t.max_deleted_fraction,
            },
        }
        failures = [k for k, v in checks.items() if not v["ok"]]
        if not failures:
            status = HEALTHY
        elif len(failures) == 1:
            status = WARNING
        else:
            status = CRITICAL
        report = HealthReport(status=status, checks=checks, at=now)
        if status != HEALTHY:
            for handler in self.alert_handlers:
                try:
                    handler(report)
                except Exception as e:  # noqa: BLE001
                    log.warning("alert handler error: %s", e)
        return report

    def start_periodic(self, interval_secs: float = 60.0) -> None:
        if self._thread is not None:
            return
        self._stop.clear()

        def loop():
            while not self._stop.wait(interval_secs):
                self.check()

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop_periodic(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=2.0)
            self._thread = None
