"""Maintenance subsystem tests (mirrors reference src/hybrid/maintenance.rs
and search_integration.rs behavior)."""
import time

import numpy as np
import pytest

from fabstir_vectordb_tpu.core import MemoryObjectStore
from fabstir_vectordb_tpu.index import HybridIndex, HybridConfig, IVFConfig
from fabstir_vectordb_tpu.maintenance import (
    BackupManager,
    CachedHybridIndex,
    HealthMonitor,
    HealthThresholds,
    IndexCleaner,
    IndexRebalancer,
    MigrationPolicy,
    MigrationScheduler,
    QueryExpander,
    QueryOptimizer,
    RelevanceScorer,
    ResultMerger,
    parallel_search,
)

NOW = 1_700_000_000.0
DAY = 86_400.0


def build_index(n=120, dim=8, all_recent=False):
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    idx = HybridIndex(dim, HybridConfig(
        ivf=IVFConfig(n_clusters=4, n_probe=4), auto_migrate=False,
    ))
    idx.initialize(vecs)
    ts = np.full(n, NOW - DAY) if all_recent else np.where(
        np.arange(n) % 2 == 0, NOW - DAY, NOW - 30 * DAY
    )
    idx.insert_batch([f"v{i}" for i in range(n)], vecs, ts, now=NOW)
    return idx, vecs


class TestMigrationScheduler:
    def test_run_migration_respects_max_per_run(self):
        idx, _ = build_index(n=120, all_recent=True)
        sched = MigrationScheduler(idx, MigrationPolicy(batch_size=10, max_per_run=25))
        moved = sched.run_migration(now=NOW + 10 * DAY)
        assert moved == 25
        assert sched.stats.runs == 1 and sched.stats.migrated_total == 25

    def test_quiet_hours_skip(self):
        idx, _ = build_index(n=20, all_recent=True)
        sched = MigrationScheduler(idx, MigrationPolicy(quiet_hours=(0, 24)))
        assert sched.run_migration(now=NOW + 10 * DAY) == 0

    def test_continuous_loop(self):
        idx, _ = build_index(n=40, all_recent=True)
        sched = MigrationScheduler(idx, MigrationPolicy(interval_secs=0.05,
                                                        max_per_run=1000))
        # trick: time passes so everything is old
        idx.config.recent_threshold_secs = 0.0
        sched.start_continuous()
        assert sched.running
        time.sleep(0.3)
        sched.stop_continuous()
        assert not sched.running
        assert sched.stats.migrated_total > 0


class TestRebalancerAndCleaner:
    def test_analyze_and_rebalance(self):
        idx, _ = build_index(n=200)
        reb = IndexRebalancer(idx)
        report = reb.analyze_balance()
        assert len(report.sizes) == 4
        moves = reb.rebalance_ivf(max_ratio=1.2)
        assert moves >= 0

    def test_cleaner_scan_and_cleanup(self):
        idx, _ = build_index(n=60)
        idx.delete("v0")
        idx.delete("v1")
        cleaner = IndexCleaner(idx)
        issues = cleaner.scan_for_issues()
        assert issues["soft_deleted"] == 2 and issues["needs_vacuum"]
        assert issues["graph_ok"]
        result = cleaner.cleanup()
        assert result["total_removed"] == 2
        cleaner.compact()


class TestBackupManager:
    def test_backup_verify_restore(self):
        store = MemoryObjectStore()
        idx, vecs = build_index(n=80)
        mgr = BackupManager(store)
        rec = mgr.create_backup(idx, "sess", backup_id="b1", now=NOW)
        assert rec.n_keys > 0 and not rec.incremental
        assert mgr.verify_backup("sess", "b1")
        assert not mgr.verify_backup("sess", "ghost")

        # mutate + second (incremental) backup
        idx.delete("v0")
        rec2 = mgr.create_backup(idx, "sess", backup_id="b2", now=NOW + 1)
        assert rec2.incremental
        assert len(mgr.list_backups("sess")) == 2

        # corrupt live state, restore point-in-time b1
        store.put("sess/manifest.json", b"garbage")
        mgr.restore("sess", "b1")
        idx2, _ = mgr.load_restored("sess")
        assert idx2.store.active_count == 80  # b1 predates the delete


class TestHealthMonitor:
    def test_healthy_report(self):
        idx, _ = build_index(n=40)
        mon = HealthMonitor(idx)
        report = mon.check(now=NOW)
        assert report.healthy

    def test_warning_and_alert_handler(self):
        idx, _ = build_index(n=40, all_recent=True)
        alerts = []
        mon = HealthMonitor(
            idx, HealthThresholds(max_migration_backlog=5)
        )
        mon.on_alert(alerts.append)
        report = mon.check(now=NOW + 30 * DAY)  # everything overdue
        assert report.status in ("warning", "critical")
        assert alerts and alerts[0].status == report.status

    def test_critical_when_multiple_failures(self):
        idx, _ = build_index(n=40, all_recent=True)
        mon = HealthMonitor(
            idx,
            HealthThresholds(max_migration_backlog=1, max_memory_bytes=1),
        )
        assert mon.check(now=NOW + 30 * DAY).status == "critical"


class TestSearchIntegration:
    def test_parallel_search_merges_engines(self):
        idx, vecs = build_index(n=100)
        out = parallel_search(idx, vecs[10], 5)
        assert out and out[0][0] == "v10"
        scores = [s for _, s in out]
        assert scores == sorted(scores, reverse=True)

    def test_result_merger_strategies(self):
        sets = {
            "a": [("x", 0.9), ("y", 0.5)],
            "b": [("x", 0.7), ("z", 0.6)],
        }
        best = ResultMerger("take_best").merge(sets, 3)
        assert dict(best)["x"] == 0.9
        avg = ResultMerger("average").merge(sets, 3)
        assert abs(dict(avg)["x"] - 0.8) < 1e-9
        weighted = ResultMerger("weighted", {"a": 0.5, "b": 1.0}).merge(sets, 3)
        assert abs(dict(weighted)["x"] - 0.7) < 1e-9
        with pytest.raises(ValueError):
            ResultMerger("nope")

    def test_relevance_scorers(self):
        s = RelevanceScorer("time_decay", half_life_secs=10.0)
        full = s.score(0.0, age_secs=0.0)
        half = s.score(0.0, age_secs=10.0)
        assert abs(half / full - 0.5) < 1e-9
        pop = RelevanceScorer("popularity")
        assert pop.score(0.5, views=100) > pop.score(0.5, views=0)
        comb = RelevanceScorer("combined", weights=(1.0, 1.0, 0.1))
        assert comb.score(0.2, 5.0, 10.0) > 0

    def test_query_optimizer_scales(self):
        opt = QueryOptimizer()
        small = opt.suggest(500)
        big = opt.suggest(2_000_000)
        assert big["hnsw_ef"] > small["hnsw_ef"]
        assert big["ivf_n_probe"] > small["ivf_n_probe"]
        assert opt.suggest(500, target_recall=0.99)["hnsw_ef"] > small["hnsw_ef"]

    def test_query_expander(self):
        exp = QueryExpander(n_variants=3, noise_scale=0.01)
        q = np.ones(8, np.float32)
        variants = exp.expand(q)
        assert variants.shape == (4, 8)
        np.testing.assert_array_equal(variants[0], q)
        assert not np.allclose(variants[1], q)

    def test_cached_index_hit_rate(self):
        idx, vecs = build_index(n=60)
        cached = CachedHybridIndex(idx, max_entries=10)
        r1 = cached.search(vecs[5], 3, now=NOW)
        r2 = cached.search(vecs[5], 3, now=NOW)
        assert r1 == r2
        assert cached.stats.hits == 1 and cached.stats.misses == 1
        assert 0 < cached.stats.hit_rate < 1
        cached.invalidate()
        cached.search(vecs[5], 3, now=NOW)
        assert cached.stats.misses == 2

    def test_cached_index_fifo_eviction(self):
        idx, vecs = build_index(n=60)
        cached = CachedHybridIndex(idx, max_entries=2)
        for i in range(4):
            cached.search(vecs[i], 2, now=NOW)
        cached.search(vecs[0], 2, now=NOW)  # evicted -> miss again
        assert cached.stats.misses == 5
