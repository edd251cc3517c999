"""PerfMonitor stats math + thread-safety (reference parity:
SearchPerformanceMonitor avg/p50/p99, hybrid/search_integration.rs)."""
import threading

from fabstir_vectordb_tpu.utils.tracing import PerfMonitor


def test_percentile_math_known_values():
    m = PerfMonitor()
    for v in range(1, 101):  # 1..100 ms
        m.record(float(v))
    s = m.stats()
    assert s["total_searches"] == 100
    assert s["avg_ms"] == 50.5
    assert abs(s["p50_ms"] - 50.0) <= 1.0
    assert abs(s["p99_ms"] - 99.0) <= 1.0


def test_empty_and_reset():
    m = PerfMonitor()
    assert m.stats() == {"total_searches": 0, "avg_ms": 0.0,
                         "p50_ms": 0.0, "p99_ms": 0.0}
    m.record(5.0)
    assert m.stats()["total_searches"] == 1
    m.reset()
    assert m.stats()["total_searches"] == 0


def test_timer_context_and_concurrent_record():
    m = PerfMonitor()
    with m.time():
        pass
    assert m.stats()["total_searches"] == 1

    def hammer():
        for _ in range(500):
            m.record(1.0)

    threads = [threading.Thread(target=hammer) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert m.stats()["total_searches"] == 1 + 4 * 500
