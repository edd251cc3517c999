"""Unit tests for ops.projection (reduced-rank serving) and kmeans|| init."""
import numpy as np
import pytest

from fabstir_vectordb_tpu.ops.projection import fit_pca, project


class TestPCA:
    def test_projection_shapes_and_determinism(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((500, 64)).astype(np.float32)
        mu, p = fit_pca(x, 16)
        assert mu.shape == (64,) and p.shape == (64, 16)
        mu2, p2 = fit_pca(x, 16)
        np.testing.assert_array_equal(p, p2)
        xp = project(x, mu, p)
        assert xp.shape == (500, 16) and xp.dtype == np.float32

    def test_rank_clamped(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((10, 8)).astype(np.float32)
        _, p = fit_pca(x, 999)
        assert p.shape[1] == 8

    def test_top_rank_preserves_low_rank_structure(self):
        """Data living in an r-dim subspace projects with zero distance
        distortion at rank >= r."""
        rng = np.random.default_rng(2)
        basis = np.linalg.qr(rng.standard_normal((64, 8)))[0]  # [64, 8]
        z = rng.standard_normal((300, 8)).astype(np.float32)
        x = (z @ basis.T).astype(np.float32)
        mu, p = fit_pca(x, 8)
        xp = project(x, mu, p)
        d_orig = ((x[:50, None, :] - x[None, :50, :]) ** 2).sum(-1)
        d_proj = ((xp[:50, None, :] - xp[None, :50, :]) ** 2).sum(-1)
        np.testing.assert_allclose(d_proj, d_orig, rtol=1e-3, atol=1e-3)

    def test_nearest_neighbor_preserved_on_clustered_data(self):
        rng = np.random.default_rng(3)
        centers = rng.standard_normal((10, 96)).astype(np.float32)
        x = (centers[rng.integers(0, 10, 2000)]
             + 0.05 * rng.standard_normal((2000, 96)).astype(np.float32))
        mu, p = fit_pca(x, 24)
        xp = project(x, mu, p)
        q = x[:64] + 0.01
        qp = project(q, mu, p)
        d = ((qp[:, None, :] - xp[None, :, :]) ** 2).sum(-1)
        top1 = d.argmin(1)
        assert (top1 == np.arange(64)).mean() >= 0.95


class TestScalableKMeans:
    def test_matches_pp_converged_error(self):
        import jax
        import jax.numpy as jnp

        from fabstir_vectordb_tpu.ops.kmeans import (
            _lloyd_step_jit, kmeans_pp_init, kmeans_scalable_init)

        rng = np.random.default_rng(0)
        centers = rng.standard_normal((16, 24)).astype(np.float32)
        x = (centers[rng.integers(0, 16, 4000)]
             + 0.1 * rng.standard_normal((4000, 24)).astype(np.float32))
        xj = jnp.asarray(x)
        mask = jnp.ones(4000, bool)

        def converge(cents):
            last = np.inf
            for _ in range(50):
                cents, err = _lloyd_step_jit(xj, mask, cents)
                e = float(err)
                if abs(last - e) / max(last, 1e-30) < 1e-6:
                    break
                last = e
            return e

        e_sc = converge(kmeans_scalable_init(jax.random.PRNGKey(0), xj, mask, 16))
        e_pp = converge(kmeans_pp_init(jax.random.PRNGKey(0), xj, mask, 16))
        assert e_sc <= e_pp * 1.5 + 1e-6, (e_sc, e_pp)

    def test_masked_rows_never_selected(self):
        import jax
        import jax.numpy as jnp

        from fabstir_vectordb_tpu.ops.kmeans import kmeans_scalable_init

        rng = np.random.default_rng(4)
        x = rng.standard_normal((1000, 8)).astype(np.float32)
        x[500:] = 1e6  # poisoned rows, masked out
        mask = jnp.arange(1000) < 500
        cents = np.asarray(
            kmeans_scalable_init(jax.random.PRNGKey(1), jnp.asarray(x), mask, 8)
        )
        assert np.abs(cents).max() < 1e3

    def test_stepped_train_converges(self):
        import jax
        import jax.numpy as jnp

        from fabstir_vectordb_tpu.ops.kmeans import kmeans_train_stepped

        rng = np.random.default_rng(5)
        centers = rng.standard_normal((8, 16)).astype(np.float32)
        x = (centers[rng.integers(0, 8, 2000)]
             + 0.05 * rng.standard_normal((2000, 16)).astype(np.float32))
        res = kmeans_train_stepped(
            jax.random.PRNGKey(0), jnp.asarray(x), jnp.ones(2000, bool), 8)
        assert res.centroids.shape == (8, 16)
        assert float(res.final_error) < 0.1
        assert bool(res.converged)

    def test_blocked_train_matches_one_step_loop_exactly(self):
        """The 5-iterations-per-dispatch block must stop at EXACTLY the
        iteration a one-Lloyd-step-per-round-trip loop would, with the
        same centroids — the blocking is a round-trip optimization, not a
        semantics change."""
        import jax
        import jax.numpy as jnp

        from fabstir_vectordb_tpu.ops.kmeans import (
            _lloyd_step_jit, kmeans_scalable_init, kmeans_train_stepped)

        rng = np.random.default_rng(6)
        centers = rng.standard_normal((8, 16)).astype(np.float32)
        x = jnp.asarray(centers[rng.integers(0, 8, 1500)]
                        + 0.05 * rng.standard_normal((1500, 16)
                                                     ).astype(np.float32))
        mask = jnp.ones(1500, bool)
        key = jax.random.PRNGKey(3)
        res = kmeans_train_stepped(key, x, mask, 8, max_iterations=25,
                                   tol=1e-4)

        # reference twin: the pre-block per-step loop, same seeding
        cents = kmeans_scalable_init(key, x, mask, 8)
        last_err, i, converged = float("inf"), 0, False
        err = jnp.float32(0.0)
        while i < 25:
            cents, err = _lloyd_step_jit(x, mask, cents)
            err_f = float(err)
            if i > 0 and abs(last_err - err_f) / max(last_err, 1e-30) < 1e-4:
                converged, i = True, i + 1
                break
            last_err, i = err_f, i + 1

        assert int(res.iterations) == i
        assert bool(res.converged) == converged
        np.testing.assert_allclose(np.asarray(res.centroids),
                                   np.asarray(cents), rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(float(res.final_error), float(err),
                                   rtol=1e-6)


class TestPQProperties:
    def test_adc_equals_decoded_distance_and_dim_validation(self):
        """ADC lookup distances must equal exact distances to the DECODED
        vectors (that is the ADC contract); non-divisible dims rejected."""
        import jax
        import jax.numpy as jnp

        from fabstir_vectordb_tpu.ops.quantization import (
            pq_adc_distances, pq_adc_table, pq_decode, pq_encode, pq_train)

        rng = np.random.default_rng(0)
        key = jax.random.PRNGKey(0)
        x = jnp.asarray(rng.standard_normal((400, 24)).astype(np.float32))
        with pytest.raises(ValueError):
            pq_train(key, x[:, :22], n_subspaces=8)

        cb = pq_train(key, x, n_subspaces=8, n_codes=16)
        codes = pq_encode(cb.centroids, x)
        dec = np.asarray(pq_decode(cb.centroids, codes))
        table = pq_adc_table(cb.centroids, x[:4])
        d = np.asarray(pq_adc_distances(table, codes))
        exact = ((np.asarray(x[:4])[:, None, :] - dec[None, :, :]) ** 2).sum(-1)
        np.testing.assert_allclose(d, exact, atol=1e-4)
        # encoding is idempotent: re-encoding decoded vectors gives same codes
        codes2 = pq_encode(cb.centroids, jnp.asarray(dec))
        np.testing.assert_array_equal(np.asarray(codes), np.asarray(codes2))
