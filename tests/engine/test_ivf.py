"""IVF engine tests (mirrors reference tests/ivf/* behavior)."""
import numpy as np
import pytest

from fabstir_vectordb_tpu.index import VectorStore, IVFIndex, IVFConfig
from fabstir_vectordb_tpu.index.ivf import NotTrainedError, TrainingError


def clustered_data(n_clusters=8, per=40, dim=16, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim)).astype(np.float32) * 10
    vecs = np.concatenate(
        [c + rng.standard_normal((per, dim)).astype(np.float32) for c in centers]
    )
    return vecs, centers


def make_index(n_clusters=8, per=40, dim=16):
    vecs, centers = clustered_data(n_clusters, per, dim)
    store = VectorStore(dim)
    rows = store.add_batch([f"v{i}" for i in range(len(vecs))], vecs)
    cfg = IVFConfig(n_clusters=n_clusters, n_probe=2, train_size=10_000, seed=0)
    ivf = IVFIndex(store, cfg)
    ivf.train(vecs)
    ivf.insert_rows(rows)
    return store, ivf, vecs


class TestTraining:
    def test_train_requires_enough_vectors(self):
        store = VectorStore(8)
        ivf = IVFIndex(store, IVFConfig(n_clusters=16))
        with pytest.raises(TrainingError):
            ivf.train(np.zeros((5, 8), np.float32))

    def test_search_before_train_fails(self):
        store = VectorStore(8)
        ivf = IVFIndex(store)
        with pytest.raises(NotTrainedError):
            ivf.search_rows(np.zeros((1, 8), np.float32), 3)

    def test_train_converges_on_clustered_data(self):
        vecs, _ = clustered_data()
        store = VectorStore(16)
        ivf = IVFIndex(store, IVFConfig(n_clusters=8, seed=0))
        stats = ivf.train(vecs)
        assert stats.iterations <= 25
        assert stats.final_error < 100.0


class TestSearch:
    def test_nearest_found_with_low_nprobe(self):
        store, ivf, vecs = make_index()
        q = vecs[13] + 0.01
        d, rows = ivf.search_rows(q[None], 5, n_probe=2)
        assert rows[0, 0] == 13
        assert d[0, 0] < 0.2

    def test_full_probe_equals_exact(self):
        from fabstir_vectordb_tpu.index import FlatIndex
        from fabstir_vectordb_tpu.index.flat import recall_at_k

        store, ivf, vecs = make_index()
        rng = np.random.default_rng(1)
        q = vecs[rng.integers(0, len(vecs), 16)] + 0.05
        _, rows = ivf.search_rows(q, 10, n_probe=8)  # probe all clusters
        oracle = FlatIndex(store)
        assert recall_at_k(oracle, rows, q, 10) == 1.0

    def test_recall_improves_with_nprobe(self):
        from fabstir_vectordb_tpu.index import FlatIndex
        from fabstir_vectordb_tpu.index.flat import recall_at_k

        store, ivf, vecs = make_index(n_clusters=16, per=30)
        rng = np.random.default_rng(2)
        q = rng.standard_normal((16, 16)).astype(np.float32) * 5
        oracle = FlatIndex(store)
        recalls = []
        for p in (1, 4, 16):
            _, rows = ivf.search_rows(q, 10, n_probe=p)
            recalls.append(recall_at_k(oracle, rows, q, 10))
        assert recalls[0] <= recalls[1] <= recalls[2]
        assert recalls[2] == 1.0

    def test_deleted_vectors_skipped(self):
        store, ivf, vecs = make_index()
        q = vecs[13]
        store.mark_deleted("v13")
        _, rows = ivf.search_rows(q[None], 3)
        assert 13 not in rows[0]

    def test_batch_search(self):
        store, ivf, vecs = make_index()
        q = np.stack([vecs[0], vecs[50], vecs[100]])
        _, rows = ivf.search_rows(q, 1, n_probe=3)
        assert list(rows[:, 0]) == [0, 50, 100]


class TestOperations:
    def test_vacuum_removes_deleted(self):
        store, ivf, vecs = make_index()
        store.mark_deleted("v0")
        store.mark_deleted("v1")
        assert ivf.deleted_count == 2
        removed = ivf.vacuum()
        assert removed == 2
        assert ivf.active_count == len(vecs) - 2
        store.vacuum()

    def test_cluster_stats(self):
        store, ivf, vecs = make_index(n_clusters=8, per=40)
        stats = ivf.cluster_stats()
        assert stats.total_vectors == len(vecs)
        assert len(stats.sizes) == 8
        assert stats.empty_clusters <= 1
        assert stats.mean_variance > 0

    def test_retrain(self):
        store, ivf, vecs = make_index()
        stats = ivf.retrain(IVFConfig(n_clusters=4, n_probe=2, seed=1))
        assert ivf.centroids.shape[0] == 4
        assert ivf.active_count == len(vecs)
        assert stats.iterations >= 1

    def test_add_clusters_reassigns(self):
        store, ivf, vecs = make_index(n_clusters=4)
        ivf.add_clusters(2)
        assert ivf.centroids.shape[0] == 6
        assert ivf.active_count == len(vecs)

    def test_balance_clusters(self):
        dim = 8
        rng = np.random.default_rng(0)
        # one dense blob + sparse outliers -> heavily imbalanced clusters
        blob = rng.standard_normal((200, dim)).astype(np.float32) * 0.1
        outliers = rng.standard_normal((8, dim)).astype(np.float32) * 20
        vecs = np.concatenate([blob, outliers])
        store = VectorStore(dim)
        rows = store.add_batch([f"v{i}" for i in range(len(vecs))], vecs)
        ivf = IVFIndex(store, IVFConfig(n_clusters=4, n_probe=4, seed=0))
        ivf.train(vecs)
        ivf.insert_rows(rows)
        before = max(ivf.cluster_stats().sizes)
        moves = ivf.balance_clusters(max_ratio=1.5)
        if moves:
            assert max(ivf.cluster_stats().sizes) <= before

    def test_balance_clusters_caps_receivers(self):
        """Receivers must respect the same size limit — the reference's
        unconditional next-nearest policy grows the SECOND-largest cluster
        on dense corpora (measured at 1M: the serving tile width doubled
        instead of shrinking). After balancing, no cluster may exceed the
        limit by more than the leftover that had no legal receiver."""
        dim = 8
        rng = np.random.default_rng(3)
        # two overlapping dense blobs: the old policy dumps blob A's excess
        # straight into blob B's cluster
        a = rng.standard_normal((300, dim)).astype(np.float32) * 0.1
        b = rng.standard_normal((260, dim)).astype(np.float32) * 0.1 + 0.3
        far = rng.standard_normal((40, dim)).astype(np.float32) * 10
        vecs = np.concatenate([a, b, far])
        store = VectorStore(dim)
        rows = store.add_batch([f"v{i}" for i in range(len(vecs))], vecs)
        ivf = IVFIndex(store, IVFConfig(n_clusters=8, n_probe=8, seed=0))
        ivf.train(vecs)
        ivf.insert_rows(rows)
        sizes0 = np.asarray(ivf.cluster_stats().sizes)
        mean = sizes0[sizes0 > 0].mean()
        limit = max(int(mean * 1.5), 1)
        moves = ivf.balance_clusters(max_ratio=1.5)
        assert moves > 0
        sizes1 = np.asarray(ivf.cluster_stats().sizes)
        # every cluster that RECEIVED rows stays at/under the limit
        grew = sizes1 > sizes0
        assert (sizes1[grew] <= limit).all(), (sizes0, sizes1, limit)
        # total membership conserved
        assert sizes1.sum() == sizes0.sum()
        # searches still find every vector (assignment integrity)
        _, r = ivf.search_rows(vecs[5][None], 1)
        assert store.row_of("v5") == r[0, 0]

    def test_centroid_export_import(self):
        store, ivf, vecs = make_index()
        cents = ivf.export_centroids()
        store2 = VectorStore(16)
        rows2 = store2.add_batch([f"w{i}" for i in range(len(vecs))], vecs)
        ivf2 = IVFIndex(store2, ivf.config)
        ivf2.import_centroids(cents)
        ivf2.insert_rows(rows2)
        q = vecs[7][None]
        _, r1 = ivf.search_rows(q, 3)
        _, r2 = ivf2.search_rows(q, 3)
        np.testing.assert_array_equal(r1, r2)

    def test_evaluate_search_quality(self):
        store, ivf, vecs = make_index()
        rng = np.random.default_rng(3)
        q = vecs[rng.integers(0, len(vecs), 8)]
        quality = ivf.evaluate_search_quality(q, k=5)
        assert 0.5 <= quality["recall"] <= 1.0
        assert quality["avg_query_ms"] >= 0


def test_optimize_and_compact_clusters():
    """optimize_clusters retrains over current members and reports variance
    delta; compact_clusters rebuilds tiles at minimal padding (reference:
    ivf/operations.rs:222-261, 394-420)."""
    rng = np.random.default_rng(3)
    dim = 16
    centers = rng.standard_normal((4, dim)).astype(np.float32)
    vecs = (centers[rng.integers(0, 4, 600)]
            + 0.05 * rng.standard_normal((600, dim)).astype(np.float32))
    store = VectorStore(dim)
    rows = store.add_batch([f"v{i}" for i in range(600)], vecs)
    ivf = IVFIndex(store, IVFConfig(n_clusters=4, n_probe=4, seed=1))
    # deliberately bad centroids -> optimize should improve variance
    ivf.set_trained(rng.standard_normal((4, dim)).astype(np.float32))
    ivf.insert_rows(rows)
    before = ivf.cluster_stats().mean_variance
    rep = ivf.optimize_clusters()
    assert rep["variance_before"] == pytest.approx(before)
    assert rep["variance_after"] <= rep["variance_before"] + 1e-6
    # compact: tiles rebuild and search still exact-ish with full probes
    ivf.compact_clusters()
    d, r = ivf.search_rows(vecs[:4], 1, n_probe=4)
    assert (r[:, 0] == np.arange(4)).mean() >= 0.75


def test_cosine_and_dot_metrics_match_flat_oracle():
    """IVF nprobe scan under cosine/dot metrics agrees with the flat oracle
    at full probes (reference supports euclidean/cosine/angular/dot —
    vector_ops distances; here the metric threads through centroid ranking
    AND the list scan)."""
    from fabstir_vectordb_tpu.index.flat import FlatIndex

    rng = np.random.default_rng(9)
    dim, n = 24, 800
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    store = VectorStore(dim)
    rows = store.add_batch([f"v{i}" for i in range(n)], vecs)
    ivf = IVFIndex(store, IVFConfig(n_clusters=8, n_probe=8, seed=2))
    ivf.train(vecs)
    ivf.insert_rows(rows)

    q = vecs[:16] + 0.01
    for metric in ("cosine", "dot"):
        oracle = FlatIndex(store, metric=metric)
        _, orows = oracle.search_rows(q, 5)
        _, irows = ivf.search_rows(q, 5, n_probe=8, metric=metric)
        top1_agree = (irows[:, 0] == orows[:, 0]).mean()
        assert top1_agree >= 0.9, (metric, top1_agree)


class TestIVFRobustness:
    """Regressions for review findings on the IVF engine."""

    def test_cluster_stats_empty_cluster_variance_is_zero(self):
        """np.divide(..., where=) without out= leaves masked slots as
        uninitialized memory — empty clusters must report 0.0."""
        store, ivf, vecs = make_index(n_clusters=8, per=40)
        # force an empty cluster: move every member of cluster 0 elsewhere
        rows0 = np.nonzero(ivf.assignments == 0)[0]
        ivf.assignments[rows0] = 1
        ivf._version += 1
        stats = ivf.cluster_stats()
        assert stats.sizes[0] == 0
        assert stats.variances[0] == 0.0

    def test_shrinking_centroid_import_keeps_index_servable(self):
        """Importing FEWER centroids than assignments reference must not
        crash the next tile build — out-of-range assignments drop."""
        store, ivf, vecs = make_index(n_clusters=8, per=40)
        ivf.import_centroids(ivf.export_centroids()[:4])
        assert (ivf.assignments < 4).all()
        d, rows = ivf.search_rows(vecs[:2], 3, n_probe=4)
        assert (rows >= -1).all()
        # reassignment restores full membership
        live = np.nonzero(ivf.member_mask()[: store.count])[0]
        ivf.insert_rows(np.arange(store.count))
        assert ivf.member_mask()[: store.count].all()

    def test_set_trained_invalid_shape_preserves_state(self):
        store, ivf, vecs = make_index()
        good = ivf.export_centroids()
        with pytest.raises(TrainingError):
            ivf.set_trained(np.zeros(16, np.float32))  # 1-D: invalid
        assert ivf.trained and ivf.centroids.shape == good.shape
        ivf.search_rows(vecs[:1], 3)  # still servable

    def test_retrain_failure_preserves_config(self):
        store, ivf, vecs = make_index(n_clusters=8, per=40)
        old_c = ivf.config.n_clusters
        with pytest.raises(TrainingError):
            ivf.retrain(IVFConfig(n_clusters=100_000))
        assert ivf.config.n_clusters == old_c
        assert ivf.centroids.shape[0] == old_c

    def test_train_samples_randomly_from_ordered_corpus(self):
        """train_size smaller than the corpus must sample across the whole
        corpus, not the (possibly single-category) head."""
        rng = np.random.default_rng(0)
        # two well-separated categories, ORDERED: category A first
        a = rng.standard_normal((600, 8)).astype(np.float32)
        b = rng.standard_normal((600, 8)).astype(np.float32) + 50.0
        vecs = np.concatenate([a, b])
        store = VectorStore(8)
        ivf = IVFIndex(store, IVFConfig(
            n_clusters=4, n_probe=4, train_size=500, seed=0))
        ivf.train(vecs)
        # at least one centroid must land near category B (mean ~50)
        assert (ivf.centroids.mean(axis=1) > 20).any()

    def test_add_clusters_ignores_deleted_outliers(self):
        store, ivf, vecs = make_index(n_clusters=4, per=40)
        outlier = np.full((1, 16), 1e3, np.float32)
        store.add_batch(["outlier"], outlier)
        ivf.insert_rows(np.array([store.count - 1]))
        store.mark_deleted("outlier")
        ivf.add_clusters(1)
        # the new centroid must NOT sit at the deleted outlier
        assert not np.allclose(ivf.centroids[-1], outlier[0], atol=1.0)

    def test_search_device_cache_invalidated_by_mutation(self):
        store, ivf, vecs = make_index(n_clusters=4, per=40)
        d1, r1 = ivf.search_rows(vecs[:1], 3)
        assert ivf._dev_search is not None
        store.mark_deleted("v0")
        d2, r2 = ivf.search_rows(vecs[:1], 3)
        assert 0 not in r2  # deleted row gone -> cache was refreshed
