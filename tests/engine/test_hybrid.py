"""Hybrid engine tests (mirrors reference tests/hybrid/* behavior)."""
import numpy as np
import pytest

from fabstir_vectordb_tpu.index import HybridIndex, HybridConfig, SearchConfig
from fabstir_vectordb_tpu.index.ivf import IVFConfig

NOW = 1_700_000_000.0
DAY = 86_400.0


def rand_vecs(n, dim=16, seed=0):
    return np.random.default_rng(seed).standard_normal((n, dim)).astype(np.float32)


def make_hybrid(n_recent=50, n_old=200, dim=16):
    vecs = rand_vecs(n_recent + n_old, dim)
    idx = HybridIndex(dim, HybridConfig(ivf=IVFConfig(n_clusters=4, n_probe=4)))
    idx.initialize(vecs)
    ids = [f"v{i}" for i in range(len(vecs))]
    ts = np.concatenate([
        np.full(n_recent, NOW - DAY),        # recent -> HNSW
        np.full(n_old, NOW - 30 * DAY),      # old -> IVF
    ])
    idx.insert_batch(ids, vecs, ts, now=NOW)
    return idx, vecs


class TestRouting:
    def test_age_based_routing(self):
        idx, vecs = make_hybrid(50, 200)
        s = idx.stats(now=NOW)
        assert s.recent_vectors == 50
        assert s.historical_vectors == 200
        assert s.total_vectors == 250
        assert s.ivf_trained

    def test_hnsw_only_mode_small_dataset(self):
        idx = HybridIndex(8)
        idx.initialize(rand_vecs(5, 8))  # < min_ivf_training_size
        assert not idx.ivf_trained
        ids = [f"s{i}" for i in range(5)]
        vecs = rand_vecs(5, 8, seed=1)
        # even old vectors route to HNSW in HNSW-only mode
        idx.insert_batch(ids, vecs, np.full(5, NOW - 100 * DAY), now=NOW)
        assert idx.stats(now=NOW).recent_vectors == 5
        res = idx.search(vecs[2], 2, now=NOW)
        assert res[0][0] == "s2"

    def test_age_distribution_buckets(self):
        idx, _ = make_hybrid(50, 200)
        dist = idx.stats(now=NOW).age_distribution
        assert dist["1-7d"] == 50
        assert dist["30d+"] == 200


class TestSearch:
    def test_search_spans_both_indices(self):
        idx, vecs = make_hybrid(50, 200)
        # query equal to a recent vector
        res = idx.search(vecs[10], 3, now=NOW)
        assert res[0][0] == "v10"
        # query equal to an old vector
        res = idx.search(vecs[120], 3, now=NOW)
        assert res[0][0] == "v120"

    def test_results_sorted_and_truncated(self):
        idx, vecs = make_hybrid(30, 100)
        res = idx.search(vecs[0], 7, now=NOW)
        assert len(res) == 7
        dists = [d for _, d in res]
        assert dists == sorted(dists)

    def test_search_config_knobs(self):
        idx, vecs = make_hybrid(30, 100)
        cfg = SearchConfig(recent_k=2, historical_k=2, hnsw_ef=80, ivf_n_probe=4)
        res = idx.search(vecs[0], 4, config=cfg, now=NOW)
        assert len(res) == 4

    def test_empty_index(self):
        idx = HybridIndex(8)
        idx.initialize(None)
        assert idx.search(np.zeros(8, np.float32), 5, now=NOW) == []


class TestFilteredSearch:
    def test_filter_pushdown(self):
        idx, vecs = make_hybrid(20, 80)
        metadata = [None] * idx.store.capacity
        for i in range(100):
            metadata[idx.store.row_of(f"v{i}")] = {
                "parity": "even" if i % 2 == 0 else "odd", "i": i
            }
        res = idx.search_with_filter(
            vecs[11], 5, {"parity": "odd"}, metadata, now=NOW
        )
        assert res[0][0] == "v11"
        for vid, _ in res:
            assert int(vid[1:]) % 2 == 1

    def test_filter_no_matches(self):
        idx, vecs = make_hybrid(20, 80)
        metadata = [{"x": 1}] * idx.store.capacity
        res = idx.search_with_filter(vecs[0], 5, {"x": 2}, metadata, now=NOW)
        assert res == []

    def test_none_filter_is_plain_search(self):
        idx, vecs = make_hybrid(20, 80)
        res = idx.search_with_filter(vecs[3], 3, None, [], now=NOW)
        assert res[0][0] == "v3"


class TestMigration:
    def test_migration_moves_membership(self):
        dim = 16
        vecs = rand_vecs(120, dim)
        idx = HybridIndex(dim, HybridConfig(
            ivf=IVFConfig(n_clusters=4, n_probe=4), auto_migrate=False,
            migration_batch_size=50,
        ))
        idx.initialize(vecs)
        ids = [f"v{i}" for i in range(120)]
        # all inserted as recent at t0
        idx.insert_batch(ids, vecs, np.full(120, NOW - 10 * DAY), now=NOW - 9 * DAY)
        assert idx.stats(now=NOW - 9 * DAY).recent_vectors == 120
        # time passes; all are now old
        n = idx.migrate_old_vectors(now=NOW)
        assert n == 50  # one batch
        total = idx.migrate_all(now=NOW)
        assert total == 70
        s = idx.stats(now=NOW)
        assert s.recent_vectors == 0 and s.historical_vectors == 120
        # no duplication: search still finds each vector once
        res = idx.search(vecs[5], 3, config=SearchConfig(auto_migrate=False), now=NOW)
        assert res[0][0] == "v5"
        assert len({r[0] for r in res}) == 3

    def test_auto_migrate_during_search(self):
        dim = 8
        vecs = rand_vecs(60, dim)
        idx = HybridIndex(dim, HybridConfig(
            ivf=IVFConfig(n_clusters=4, n_probe=4), auto_migrate=True,
            migration_batch_size=1000,
        ))
        idx.initialize(vecs)
        idx.insert_batch([f"v{i}" for i in range(60)], vecs,
                         np.full(60, NOW - 30 * DAY), now=NOW - 29 * DAY)
        idx.search(vecs[0], 1, now=NOW)  # triggers migration
        assert idx.stats(now=NOW).historical_vectors == 60

    def test_migration_noop_when_untrained(self):
        idx = HybridIndex(8)
        idx.initialize(rand_vecs(3, 8))
        idx.insert_batch(["a"], rand_vecs(1, 8), np.full(1, NOW - 100 * DAY), now=NOW)
        assert idx.migrate_old_vectors(now=NOW) == 0


class TestCRUD:
    def test_delete_and_vacuum_across_engines(self):
        idx, vecs = make_hybrid(20, 80)
        assert idx.delete("v5")       # recent
        assert idx.delete("v50")      # historical
        assert not idx.delete("v5")   # already deleted
        stats = idx.deletion_stats()
        assert stats["hnsw_deleted"] == 1
        assert stats["ivf_deleted"] == 1
        assert stats["total_deleted"] == 2
        assert set(idx.get_deleted_vectors()) == {"v5", "v50"}

        res = idx.search(vecs[5], 3, now=NOW)
        assert res[0][0] != "v5"

        vstats = idx.vacuum()
        assert vstats == {"hnsw_removed": 1, "ivf_removed": 1, "total_removed": 2}
        assert not idx.contains("v5")

    def test_batch_delete_ignores_unknown(self):
        idx, vecs = make_hybrid(10, 40)
        n = idx.batch_delete(["v1", "v2", "ghost"])
        assert n == 2

    def test_get_vector(self):
        idx, vecs = make_hybrid(10, 40)
        np.testing.assert_array_equal(idx.get_vector("v7"), vecs[7])


class TestFromParts:
    def test_roundtrip_reconstruction(self):
        idx, vecs = make_hybrid(20, 80)
        idx.delete("v3")
        ids = [idx.store.id_of(r) for r in range(idx.store.count)]
        hnsw_member = idx.hnsw.member_mask()[: idx.store.count].copy()
        idx2 = HybridIndex.from_parts(
            dim=16,
            config=idx.config,
            ids=ids,
            vectors=idx.store.data[: idx.store.count].copy(),
            timestamps=idx.store.timestamps[: idx.store.count].copy(),
            hnsw_member=hnsw_member,
            centroids=idx.ivf.export_centroids(),
            deleted_ids=idx.get_deleted_vectors(),
        )
        s1, s2 = idx.stats(now=NOW), idx2.stats(now=NOW)
        assert s1.recent_vectors == s2.recent_vectors
        assert s1.historical_vectors == s2.historical_vectors
        assert s1.deleted_recent == s2.deleted_recent
        r1 = idx.search(vecs[10], 5, config=SearchConfig(auto_migrate=False), now=NOW)
        r2 = idx2.search(vecs[10], 5, config=SearchConfig(auto_migrate=False), now=NOW)
        assert r1[0][0] == r2[0][0] == "v10"


def test_fused_flat_and_pruned_regimes_agree(rng):
    """The serving path has two regimes (exact flat scan under
    FLAT_THRESHOLD, pruned HNSW+IVF above); both must return correct
    results, and the flat regime must equal the exact oracle."""
    import fabstir_vectordb_tpu.index.fused as fused_mod
    from fabstir_vectordb_tpu.index import (
        FlatIndex, HybridConfig, HybridIndex, IVFConfig, SearchConfig,
    )

    dim, n, k = 16, 400, 5
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    idx = HybridIndex(
        dim,
        HybridConfig(ivf=IVFConfig(n_clusters=8, n_probe=8, seed=0),
                     auto_migrate=False),
    )
    idx.initialize(vecs[:100])
    ids = [f"v{i}" for i in range(n)]
    ts = np.full(n, NOW - 30 * DAY)
    ts[: n // 4] = NOW - DAY
    idx.insert_batch(ids, vecs, ts, now=NOW)
    idx.delete("v3")

    q = vecs[:8] + 0.01
    cfg = SearchConfig(auto_migrate=False)

    import os

    from fabstir_vectordb_tpu.utils import limits
    old = limits.FLAT_THRESHOLD
    try:
        limits.FLAT_THRESHOLD = 10**9
        idx.fused._key = None  # drop cached state between regime switches
        d_flat, r_flat = idx.search_rows(q, k, config=cfg, now=NOW)

        limits.FLAT_THRESHOLD = 0
        os.environ["FVDB_PCA_SERVE"] = "0"  # force the pruned kernel
        idx.fused._key = None
        d_pruned, r_pruned = idx.search_rows(q, k, config=cfg, now=NOW)

        os.environ.pop("FVDB_PCA_SERVE", None)  # default: reduced-rank
        idx.fused._key = None
        d_pca, r_pca = idx.search_rows(q, k, config=cfg, now=NOW)
    finally:
        limits.FLAT_THRESHOLD = old
        os.environ.pop("FVDB_PCA_SERVE", None)
        idx.fused._key = None

    # flat regime == exact oracle
    oracle = FlatIndex(idx.store)
    od, orows = oracle.search_rows(q, k)
    np.testing.assert_array_equal(r_flat, orows)
    assert 3 not in r_flat  # deleted row excluded

    # pruned regime: full-probe IVF + beam -> near-exact here
    assert (r_pruned[:, 0] == orows[:, 0]).mean() >= 0.9
    assert 3 not in r_pruned

    # reduced-rank regime: stage-1 PCA scan + exact rerank -> near-exact,
    # and the reranked distances are the EXACT ones
    assert (r_pca[:, 0] == orows[:, 0]).mean() >= 0.9
    assert 3 not in r_pca
    hit = r_pca == orows
    np.testing.assert_allclose(d_pca[hit], od[hit], rtol=1e-4, atol=1e-4)


def test_bfloat16_serving_mirror(rng):
    """FVDB_SERVING_DTYPE=bfloat16 halves resident vector HBM; results stay
    near-exact (f32 accumulation + f32 norms)."""
    import fabstir_vectordb_tpu.index.fused as fused_mod
    from fabstir_vectordb_tpu.index import (
        FlatIndex, HybridConfig, HybridIndex, IVFConfig, SearchConfig,
    )

    dim, n, k = 16, 500, 5
    vecs = (rng.standard_normal((n, dim)) * 3).astype(np.float32)
    idx = HybridIndex(dim, HybridConfig(
        ivf=IVFConfig(n_clusters=8, n_probe=8, seed=0), auto_migrate=False))
    idx.initialize(vecs[:100])
    idx.insert_batch([f"v{i}" for i in range(n)], vecs,
                     np.full(n, NOW - DAY), now=NOW)

    q = vecs[:8] + 0.01
    cfg = SearchConfig(auto_migrate=False)
    oracle = FlatIndex(idx.store)
    _, want = oracle.search_rows(q, k)  # exact f32, computed BEFORE the flip

    import os
    os.environ["FVDB_SERVING_DTYPE"] = "bfloat16"
    try:
        import jax.numpy as jnp
        assert idx.fused._device_state()["x"].dtype == jnp.bfloat16
        _, rows_bf16 = idx.search_rows(q, k, config=cfg, now=NOW)
    finally:
        del os.environ["FVDB_SERVING_DTYPE"]
    # top-1 identical on well-separated data; full top-k near-identical
    assert (rows_bf16[:, 0] == want[:, 0]).all()
    overlap = np.mean([
        len(set(rows_bf16[i]) & set(want[i])) / k for i in range(len(q))
    ])
    assert overlap >= 0.9


class TestPrunedRegime:
    """Exercises the beyond-flat-threshold path: fused serving dispatches
    hybrid_search_kernel (HNSW beam + IVF nprobe on device) instead of the
    exact flat matmul. Round-1 verdict: this regime had never been run."""

    def _build(self, n=6144, dim=32, seed=0):
        import numpy as np
        from fabstir_vectordb_tpu.index import (
            HybridConfig, HybridIndex, HNSWConfig, IVFConfig,
        )

        rng = np.random.default_rng(seed)
        # clustered data (16 centers): realistic recall for graph search
        centers = rng.standard_normal((16, dim)).astype(np.float32) * 4.0
        assign = rng.integers(0, 16, n)
        vecs = centers[assign] + rng.standard_normal((n, dim)).astype(np.float32)
        idx = HybridIndex(dim, HybridConfig(
            hnsw=HNSWConfig(ef_construction=96, seed=0),
            ivf=IVFConfig(n_clusters=16, n_probe=8, seed=0),
        ))
        idx.initialize(vecs[:4096])
        NOW = 1_700_000_000.0
        DAY = 86_400.0
        ids = [f"v{i}" for i in range(n)]
        # half recent (HNSW), half old (IVF)
        ts = np.where(np.arange(n) % 2 == 0, NOW - DAY, NOW - 30 * DAY)
        idx.insert_batch(ids, vecs, ts, now=NOW)
        return idx, vecs, NOW

    def test_pruned_path_recall_and_filter(self, monkeypatch):
        import numpy as np
        from fabstir_vectordb_tpu.index import SearchConfig
        from fabstir_vectordb_tpu.utils import limits

        monkeypatch.setattr(limits, "FLAT_THRESHOLD", 2048)
        monkeypatch.setenv("FVDB_PCA_SERVE", "0")  # exercise the pruned kernel
        idx, vecs, NOW = self._build()
        dev = idx.fused._device_state()
        assert dev["x"].shape[0] > limits.FLAT_THRESHOLD  # pruned regime on
        assert dev["has_hnsw"] and dev["has_ivf"]

        rng = np.random.default_rng(1)
        qi = rng.integers(0, vecs.shape[0], 64)
        queries = vecs[qi] + 0.01 * rng.standard_normal(
            (64, vecs.shape[1])).astype(np.float32)
        cfg = SearchConfig(auto_migrate=False, hnsw_ef=128)
        d, rows = idx.search_rows(queries, 10, config=cfg, now=NOW)

        # exact ground truth on host
        x = idx.store.data[: idx.store.count]
        d2 = ((queries ** 2).sum(1)[:, None] - 2.0 * queries @ x.T
              + (x ** 2).sum(1)[None, :])
        truth = np.argsort(d2, axis=1)[:, :10]
        hits = sum(
            len(set(rows[i][rows[i] >= 0]) & set(truth[i])) for i in range(64)
        )
        recall = hits / (64 * 10)
        assert recall >= 0.9, f"pruned-regime recall@10 {recall:.3f}"

        # filtered search through the pruned kernel: mask fuses into results
        mask = np.zeros(idx.store.capacity, bool)
        mask[: idx.store.count: 3] = True  # every 3rd row
        fd, frows = idx.search_rows(queries[:8], 5, config=cfg,
                                    extra_mask=mask, now=NOW)
        got = frows[frows >= 0]
        assert got.size > 0 and (got % 3 == 0).all()

    def test_pruned_path_bfloat16_end_to_end(self, monkeypatch):
        """bf16-resident corpus through the PRUNED kernels (greedy descent,
        beam, IVF nprobe): the capacity regime bf16 exists for. Build and
        serve both run with the bf16 mirror (one shared upload)."""
        import numpy as np
        import jax.numpy as jnp
        from fabstir_vectordb_tpu.index import SearchConfig
        from fabstir_vectordb_tpu.utils import limits

        monkeypatch.setenv("FVDB_SERVING_DTYPE", "bfloat16")
        monkeypatch.setattr(limits, "FLAT_THRESHOLD", 2048)
        monkeypatch.setenv("FVDB_PCA_SERVE", "0")  # exercise the pruned kernel
        idx, vecs, NOW = self._build()
        dev = idx.fused._device_state()
        assert dev["x"].dtype == jnp.bfloat16
        assert dev["x"].shape[0] > limits.FLAT_THRESHOLD

        rng = np.random.default_rng(2)
        qi = rng.integers(0, vecs.shape[0], 32)
        queries = vecs[qi] + 0.01 * rng.standard_normal(
            (32, vecs.shape[1])).astype(np.float32)
        cfg = SearchConfig(auto_migrate=False, hnsw_ef=128)
        _, rows = idx.search_rows(queries, 10, config=cfg, now=NOW)

        x = idx.store.data[: idx.store.count]
        d2 = ((queries ** 2).sum(1)[:, None] - 2.0 * queries @ x.T
              + (x ** 2).sum(1)[None, :])
        truth = np.argsort(d2, axis=1)[:, :10]
        hits = sum(
            len(set(rows[i][rows[i] >= 0]) & set(truth[i])) for i in range(32)
        )
        recall = hits / (32 * 10)
        assert recall >= 0.85, f"bf16 pruned recall@10 {recall:.3f}"

    def test_pruned_path_beats_oom_memory_bound(self, monkeypatch):
        """Beam state must be O(B*ef), not O(B*capacity): live-array bytes
        during a pruned search stay far below what a [B, cap] visited bitmap
        would cost."""
        import numpy as np
        from fabstir_vectordb_tpu.index import SearchConfig
        from fabstir_vectordb_tpu.utils import limits

        monkeypatch.setattr(limits, "FLAT_THRESHOLD", 2048)
        monkeypatch.setenv("FVDB_PCA_SERVE", "0")  # exercise the pruned kernel
        idx, vecs, NOW = self._build(n=4096)
        cfg = SearchConfig(auto_migrate=False, hnsw_ef=64)
        b = 256
        d, rows = idx.search_rows(
            np.repeat(vecs[:1], b, axis=0), 10, config=cfg, now=NOW
        )
        assert rows.shape == (b, 10)
        # the old bitmap would be b * capacity bools = 256 * 4096 = 1 MB here
        # but 1 GB at 8M rows/B=128; nothing in the jaxpr should scale with
        # capacity x batch. We can't measure HBM on CPU tests, so assert the
        # kernel's compiled live memory indirectly via its jaxpr shapes.
        import jax
        from fabstir_vectordb_tpu.index.hnsw import _beam_search_jit
        import jax.numpy as jnp

        cap, dim = idx.store.capacity, idx.store.dim
        args = (
            jnp.zeros((cap, dim)), jnp.zeros((cap,)), jnp.ones((cap,), bool),
            jnp.full((cap, 32), -1, jnp.int32), jnp.full((64, 16), -1, jnp.int32),
            jnp.full((cap,), -1, jnp.int32), jnp.zeros((4, dim)),
            jnp.zeros((4, 1), jnp.int32), jnp.ones((4,), bool), jnp.int32(0),
        )
        jaxpr = jax.make_jaxpr(
            lambda *a: _beam_search_jit(*a, ef=64, max_iters=96, use_nbrs0=True)
        )(*args)
        for eqn_var in jaxpr.jaxpr.outvars:
            pass
        text = str(jaxpr)
        assert f"bool[4,{cap}]" not in text, "visited bitmap is back"


class TestPipelinedServing:
    """search_rows_dispatch / search_rows_pipelined: async-dispatch halves
    must return bit-identical results to the eager path (pipelining may only
    overlap round-trips, never change semantics)."""

    def _build(self, rng, n=400, dim=16):
        from fabstir_vectordb_tpu.index import (
            HybridConfig, HybridIndex, IVFConfig,
        )

        vecs = rng.standard_normal((n, dim)).astype(np.float32)
        idx = HybridIndex(dim, HybridConfig(
            ivf=IVFConfig(n_clusters=8, n_probe=8, seed=0),
            auto_migrate=False))
        idx.initialize(vecs[:100])
        ts = np.where(np.arange(n) % 3 == 0, NOW - DAY, NOW - 30 * DAY)
        idx.insert_batch([f"v{i}" for i in range(n)], vecs, ts, now=NOW)
        return idx, vecs

    def test_dispatch_finalize_matches_eager(self, rng):
        from fabstir_vectordb_tpu.index import SearchConfig

        idx, vecs = self._build(rng)
        q = vecs[:8] + 0.01
        cfg = SearchConfig(auto_migrate=False)
        want_d, want_r = idx.search_rows(q, 5, config=cfg, now=NOW)
        fin = idx.search_rows_dispatch(q, 5, config=cfg, now=NOW)
        got_d, got_r = fin()
        np.testing.assert_array_equal(want_r, got_r)
        np.testing.assert_allclose(want_d, got_d, rtol=1e-6)

    def test_pipelined_matches_sequential(self, rng):
        from fabstir_vectordb_tpu.index import SearchConfig

        idx, vecs = self._build(rng)
        cfg = SearchConfig(auto_migrate=False)
        batches = [vecs[i * 8:(i + 1) * 8] + 0.01 for i in range(6)]
        got = idx.search_rows_pipelined(batches, 5, config=cfg, now=NOW,
                                        depth=3)
        assert len(got) == 6
        for qb, (gd, gr) in zip(batches, got):
            wd, wr = idx.search_rows(qb, 5, config=cfg, now=NOW)
            np.testing.assert_array_equal(wr, gr)
            np.testing.assert_allclose(wd, gd, rtol=1e-6)

    def test_dispatch_with_filter_mask(self, rng):
        from fabstir_vectordb_tpu.index import SearchConfig

        idx, vecs = self._build(rng)
        cfg = SearchConfig(auto_migrate=False)
        mask = np.zeros(idx.store.capacity, bool)
        mask[:400:2] = True
        q = vecs[:4] + 0.01
        want = idx.search_rows(q, 5, config=cfg, extra_mask=mask, now=NOW)
        got = idx.search_rows_dispatch(
            q, 5, config=cfg, extra_mask=mask, now=NOW)()
        np.testing.assert_array_equal(want[1], got[1])
        rows = got[1][got[1] >= 0]
        assert (rows % 2 == 0).all()

    def test_dispatch_per_engine_k_fallback(self, rng):
        """recent_k/historical_k configs can't use the fused fast path; the
        dispatch API must fall back to eager and still match."""
        from fabstir_vectordb_tpu.index import SearchConfig

        idx, vecs = self._build(rng)
        cfg = SearchConfig(auto_migrate=False, recent_k=3, historical_k=7)
        q = vecs[:4] + 0.01
        want = idx.search_rows(q, 5, config=cfg, now=NOW)
        got = idx.search_rows_dispatch(q, 5, config=cfg, now=NOW)()
        np.testing.assert_array_equal(want[1], got[1])


class TestReducedRankRegime:
    """Reduced-rank (PCA) serving: the default beyond-bf16-residency regime —
    stage-1 compressed exact scan + stage-2 exact host rerank."""

    def _build(self, n=3072, dim=64):
        rng = np.random.default_rng(5)
        centers = rng.standard_normal((16, dim)).astype(np.float32)
        vecs = (centers[rng.integers(0, 16, n)]
                + 0.3 * rng.standard_normal((n, dim)).astype(np.float32))
        idx = HybridIndex(dim, HybridConfig(
            ivf=IVFConfig(n_clusters=16, n_probe=8, seed=0),
            auto_migrate=False))
        idx.initialize(vecs[:2000])
        ts = np.where(np.arange(n) % 2 == 0, NOW - DAY, NOW - 30 * DAY)
        idx.insert_batch([f"v{i}" for i in range(n)], vecs, ts, now=NOW)
        return idx, vecs

    def test_recall_filter_and_dispatch_parity(self, monkeypatch):
        from fabstir_vectordb_tpu.utils import limits

        monkeypatch.setattr(limits, "FLAT_THRESHOLD", 1024)
        monkeypatch.setenv("FVDB_PCA_RANK", "24")
        idx, vecs = self._build()
        rng = np.random.default_rng(9)
        qi = rng.integers(0, vecs.shape[0], 48)
        queries = vecs[qi] + 0.01 * rng.standard_normal(
            (48, vecs.shape[1])).astype(np.float32)
        cfg = SearchConfig(auto_migrate=False)
        d, rows = idx.search_rows(queries, 10, config=cfg, now=NOW)

        x = idx.store.data[: idx.store.count]
        d2 = ((queries ** 2).sum(1)[:, None] - 2.0 * queries @ x.T
              + (x ** 2).sum(1)[None, :])
        truth = np.argsort(d2, axis=1)[:, :10]
        hits = sum(
            len(set(rows[i][rows[i] >= 0]) & set(truth[i]))
            for i in range(48))
        recall = hits / (48 * 10)
        assert recall >= 0.9, f"reduced-rank recall@10 {recall:.3f}"
        # distances are EXACT (rerank recomputes full-precision sq-L2);
        # difference form here too — the norm-expansion d2 above loses ~1e-3
        # to cancellation and would dominate the comparison
        diff = idx.store.data[np.maximum(rows, 0)] - queries[:, None, :]
        exact = np.sqrt(np.einsum("bod,bod->bo", diff, diff))
        ok = rows >= 0
        np.testing.assert_allclose(d[ok], exact[ok], rtol=1e-4, atol=1e-4)

        # filtered search through the projected path
        mask = np.zeros(idx.store.capacity, bool)
        mask[: idx.store.count: 3] = True
        fd, frows = idx.search_rows(queries[:8], 5, config=cfg,
                                    extra_mask=mask, now=NOW)
        got = frows[frows >= 0]
        assert got.size > 0 and (got % 3 == 0).all()

        # dispatch/finalize path returns the same results as eager search
        fin = idx.search_rows_dispatch(queries[:4], 10, config=cfg, now=NOW)
        dd, rr = fin()
        np.testing.assert_array_equal(rr, rows[:4])

    def test_mutation_invalidates_projection(self, monkeypatch):
        from fabstir_vectordb_tpu.utils import limits

        monkeypatch.setattr(limits, "FLAT_THRESHOLD", 1024)
        idx, vecs = self._build(n=2048)
        cfg = SearchConfig(auto_migrate=False)
        idx.search_rows(vecs[:1], 5, config=cfg, now=NOW)
        new = (vecs[100] + 0.001).astype(np.float32)
        idx.insert("fresh", new, timestamp=NOW - DAY, now=NOW)
        _, rows = idx.search_rows(new, 1, config=cfg, now=NOW)
        assert idx.store.id_of(int(rows[0, 0])) == "fresh"


def test_concurrent_inserts_searches_deletes_stay_consistent():
    """Concurrent writers (insert/delete) and readers (search) over one
    HybridIndex: the single-store RLock + functional device state must keep
    the index consistent — final counts exact, no crashes, every surviving
    id findable (mirrors the reference's Arc<RwLock> concurrency tests)."""
    import threading

    dim = 16
    rng = np.random.default_rng(0)
    base = rng.standard_normal((2000, dim)).astype(np.float32)
    idx = HybridIndex(dim, HybridConfig(
        ivf=IVFConfig(n_clusters=8, n_probe=8, seed=0), auto_migrate=False))
    idx.initialize(base)
    idx.insert_batch([f"base{i}" for i in range(2000)], base,
                     np.full(2000, NOW - 30 * DAY), now=NOW)

    errors: list = []
    extra = rng.standard_normal((400, dim)).astype(np.float32)

    def writer(t):
        try:
            for j in range(t * 100, (t + 1) * 100):
                idx.insert(f"w{j}", extra[j % 400], timestamp=NOW - DAY,
                           now=NOW)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    def deleter():
        try:
            for i in range(0, 200):
                idx.delete(f"base{i}")
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    def reader():
        try:
            for i in range(40):
                d, rows = idx.search_rows(base[i + 500], 5, now=NOW)
                assert rows.shape == (1, 5)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = (
        [threading.Thread(target=writer, args=(t,)) for t in range(2)]
        + [threading.Thread(target=deleter)]
        + [threading.Thread(target=reader) for _ in range(2)]
    )
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors

    s = idx.stats(now=NOW)
    # 2000 base + 200 writes - 200 deletes = 2000 active
    assert s.total_vectors == 2000
    assert idx.deletion_stats()["total_deleted"] == 200
    for j in (0, 99, 199):
        assert idx.contains(f"w{j}")
    # surviving ids still findable with exact search
    for probe in (250, 900, 1700):
        res = idx.search(base[probe], 1, now=NOW)
        assert res[0][0] == f"base{probe}"


def test_search_oversampled_post_filter_matches_reference_strategy():
    """The reference's k*oversample unfiltered search + O(k) predicate
    post-filter (hybrid/core.rs:513-549) — the fallback for filters the
    columnar index can't lower."""
    idx, vecs = make_hybrid(20, 80)
    res = idx.search_oversampled_post_filter(
        vecs[11], 5, lambda vid: int(vid[1:]) % 2 == 1, now=NOW)
    assert res and res[0][0] == "v11"
    assert all(int(vid[1:]) % 2 == 1 for vid, _ in res)
    assert len(res) <= 5


class TestRouterRobustness:
    """Regressions for review findings on the hybrid router."""

    def test_bad_timestamps_shape_rejected_before_mutation(self):
        """A short timestamps list must raise BEFORE the store mutates —
        otherwise the ids orphan in rows no engine serves, and re-insert
        is a DuplicateIdError."""
        idx = HybridIndex(16, HybridConfig(ivf=IVFConfig(n_clusters=4,
                                                         n_probe=4)))
        vecs = rand_vecs(3)
        idx.initialize(rand_vecs(20, seed=1))
        with pytest.raises(ValueError):
            idx.insert_batch(["a", "b", "c"], vecs,
                             timestamps=[NOW - DAY], now=NOW)
        assert not idx.store.contains("a")
        # retry with correct shapes succeeds
        idx.insert_batch(["a", "b", "c"], vecs,
                         timestamps=np.full(3, NOW - DAY), now=NOW)
        assert idx.stats(now=NOW).total_vectors == 3

    def test_no_duplicate_results_when_row_in_both_engines(self):
        """A migration batch mid-flight (in IVF, not yet removed from
        HNSW) must occupy ONE result slot, not two."""
        idx, vecs = make_hybrid(n_recent=30, n_old=100)
        # forge the mid-migration state: row 5 is an HNSW member; also
        # assign it into IVF without removing it from the graph
        idx.ivf.insert_rows(np.array([5]))
        assert idx.hnsw.member_mask()[5] and idx.ivf.member_mask()[5]
        d, rows = idx.search_rows(
            vecs[5][None], 10, config=SearchConfig(auto_migrate=False),
            now=NOW)
        hits = [int(r) for r in rows[0] if r >= 0]
        assert hits.count(5) == 1, f"row 5 duplicated: {hits}"
        # non-fast path (per-engine k) must dedup too
        d2, rows2 = idx.search_rows(
            vecs[5][None], 10,
            config=SearchConfig(auto_migrate=False, recent_k=10,
                                historical_k=8), now=NOW)
        hits2 = [int(r) for r in rows2[0] if r >= 0]
        assert hits2.count(5) == 1, f"row 5 duplicated (split): {hits2}"

    def test_recent_k_zero_skips_engine(self):
        """recent_k=0 / historical_k=0 are valid 'skip this engine'
        values, not falsy stand-ins for the default."""
        idx, vecs = make_hybrid(n_recent=30, n_old=100)
        # query targets a RECENT row; with recent_k=0 it must not surface
        d, rows = idx.search_rows(
            vecs[3][None], 5,
            config=SearchConfig(auto_migrate=False, recent_k=0,
                                historical_k=5), now=NOW)
        assert 3 not in rows[0]
        assert (rows[0] >= 30).all() or (rows[0] == -1).any()

    def test_migration_due_cache_still_migrates(self):
        """The due-time fast path must not stop real migrations."""
        idx, vecs = make_hybrid(n_recent=20, n_old=50)
        assert idx.stats(now=NOW).recent_vectors == 20
        # nothing old yet: first call scans and caches the due time
        assert idx.migrate_old_vectors(now=NOW) == 0
        assert idx.migrate_old_vectors(now=NOW) == 0  # cached skip
        # advance past the threshold: the cache must let the scan run
        later = NOW + 8 * DAY
        moved = 0
        while True:
            n = idx.migrate_old_vectors(now=later)
            if n == 0:
                break
            moved += n
        assert moved == 20
        assert idx.stats(now=later).recent_vectors == 0

    def test_age_buckets_sum_with_future_timestamps(self):
        idx = HybridIndex(16, HybridConfig(ivf=IVFConfig(n_clusters=4,
                                                         n_probe=4)))
        idx.initialize(rand_vecs(20, seed=2))
        vecs = rand_vecs(4, seed=3)
        ts = np.array([NOW + DAY, NOW - DAY, NOW - 10 * DAY,
                       NOW - 40 * DAY])
        idx.insert_batch(["f", "r", "m", "o"], vecs, ts, now=NOW)
        s = idx.stats(now=NOW)
        assert sum(s.age_distribution.values()) == s.total_vectors == 4
