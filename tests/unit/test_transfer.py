"""put_bf16 u16-view fast path: must be bit-identical to a plain
jnp.asarray(x, bfloat16) upload for every input dtype/layout it accepts
(the mirror staged through it must never disagree with a rebuilt one)."""
import ml_dtypes
import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from fabstir_vectordb_tpu.utils.transfer import put_bf16


def _bits(a):
    return np.asarray(a).view(np.uint16)


class TestPutBf16:
    def test_f32_input_matches_direct_cast(self):
        x = np.random.default_rng(0).normal(size=(37, 12)).astype(np.float32)
        out = put_bf16(x)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            _bits(out), _bits(jnp.asarray(x, jnp.bfloat16)))

    def test_bf16_input_ships_same_bits(self):
        x = np.random.default_rng(1).normal(size=(5, 8)).astype(
            ml_dtypes.bfloat16)
        np.testing.assert_array_equal(_bits(put_bf16(x)), x.view(np.uint16))

    def test_noncontiguous_input(self):
        x = np.random.default_rng(2).normal(size=(16, 20)).astype(np.float32)
        view = x[::2, ::2]  # non-contiguous strided view
        np.testing.assert_array_equal(
            _bits(put_bf16(view)), _bits(jnp.asarray(view, jnp.bfloat16)))

    def test_specials_survive(self):
        x = np.array([[0.0, -0.0, np.inf, -np.inf, np.nan, 1e-40]],
                     np.float32)
        got = np.asarray(put_bf16(x)).astype(np.float32)
        ref = np.asarray(jnp.asarray(x, jnp.bfloat16)).astype(np.float32)
        np.testing.assert_array_equal(np.isnan(got), np.isnan(ref))
        np.testing.assert_array_equal(got[~np.isnan(got)], ref[~np.isnan(ref)])


class TestPutBf16Blocks:
    def test_blocks_bit_identical_to_monolithic(self):
        """Chunked mirror assembly (per-block watchdog heartbeats) ships
        the same bits as one put_bf16 of the full cast."""
        from fabstir_vectordb_tpu.utils.transfer import (
            put_bf16, put_bf16_blocks)

        rng = np.random.default_rng(3)
        x = rng.standard_normal((1000, 48)).astype(np.float32)
        a = np.asarray(put_bf16(x[:900]))
        # tiny block_bytes forces many blocks incl. a short tail
        b = np.asarray(put_bf16_blocks(x, 900, block_bytes=13_000))
        assert np.array_equal(a.view(np.uint16), b.view(np.uint16))

    def test_blocks_mark_progress(self):
        from fabstir_vectordb_tpu.utils import progress
        from fabstir_vectordb_tpu.utils.transfer import put_bf16_blocks

        ticks = []
        try:
            progress.set_hook(lambda: ticks.append(1))
            put_bf16_blocks(np.zeros((100, 16), np.float32), 100,
                            block_bytes=640)
        finally:
            progress.set_hook(None)
        assert len(ticks) >= 5  # one heartbeat per block
