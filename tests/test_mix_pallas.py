"""Fused Pallas mix kernel (ops/mix_pallas.py): bit-exactness against the
vmapped XLA pre-stage, run in interpret mode on the CPU test backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nanowakeword_tpu.ops import augment as A
from nanowakeword_tpu.ops.mix_pallas import mix_gain_pallas


def _inputs(B=8, n=1280, seed=0, int16=True):
    rng = np.random.default_rng(seed)
    fg = rng.integers(-16000, 16000, (B, n)).astype(np.int16)
    if not int16:
        fg = (fg.astype(np.float32) / 32768.0)
    bg = (rng.integers(-3000, 3000, (B, n)) / 32768.0).astype(np.float32)
    fg_lens = rng.integers(n // 2, n + 1, B).astype(np.int32)
    has_bg = rng.random(B) < 0.7
    return fg, bg, fg_lens, has_bg


class TestMixGainKernel:
    def test_kernel_matches_shift_scale_mix_exactly(self):
        """Direct contract: out = (has_bg ? bg + shift(fg)*scale : shift)
        * gain, bit-equal to the jnp formulation."""
        B, n = 8, 1280
        nb = n // 128
        fg, bg, _, has_bg = _inputs(B, n, seed=1)
        rng = np.random.default_rng(2)
        q = rng.integers(0, nb, B).astype(np.int32)
        scale = rng.uniform(0.1, 3.0, B).astype(np.float32)
        gain = rng.uniform(0.7, 1.4, B).astype(np.float32)

        got = np.asarray(mix_gain_pallas(
            jnp.asarray(fg), jnp.asarray(bg), jnp.asarray(q),
            jnp.asarray(scale), jnp.asarray(has_bg), jnp.asarray(gain),
            interpret=True))

        # XLA may contract `bg + shifted * scale` into an FMA (single
        # rounding) in one graph and not the other, so the two-rounding
        # numpy oracle is compared at a 2-ulp bound; gain/convert/shift
        # have no contraction freedom
        fg_unit = fg.astype(np.float32) * np.float32(1.0 / 32768.0)
        for b in range(B):
            shifted = np.zeros(n, np.float32)
            off = int(q[b]) * 128
            shifted[off:] = fg_unit[b, :n - off]
            want = np.where(has_bg[b], bg[b] + shifted * scale[b], shifted)
            want = (want * gain[b]).astype(np.float32)
            tol = 2.0 ** -22 * max(np.abs(want).max(), 1.0)
            assert np.abs(got[b] - want).max() <= tol, b

    @pytest.mark.parametrize("int16", [True, False])
    def test_fused_pre_stage_equals_vmapped_chain(self, int16):
        """_augment_pre_fused vs vmap(_augment_pre): same draws, same
        RMS/scale ops. Clips WITHOUT a background must be bit-equal; mixed
        clips are allowed <= 2 ulp (XLA FMA-contraction freedom in
        bg + shifted*scale) and must quantize within 1 int16 LSB."""
        B, n = 8, 1280
        fg, bg, fg_lens, has_bg = _inputs(B, n, seed=3, int16=int16)
        params = A.AugmentParams.from_settings({"rir_prob": 0.0})
        assert A._offset_aligned(n, params)
        keys = jax.random.split(jax.random.PRNGKey(5), B)

        fused = np.asarray(A._augment_pre_fused(
            keys, jnp.asarray(fg), jnp.asarray(bg), jnp.asarray(fg_lens),
            jnp.asarray(has_bg), params, interpret=True))

        fg_unit = jnp.asarray(fg).astype(jnp.float32) * (1.0 / 32768.0) \
            if int16 else jnp.asarray(fg)
        ref = np.asarray(jax.vmap(
            A._augment_pre, in_axes=(0, 0, 0, 0, 0, None))(
                keys, fg_unit, jnp.asarray(bg), jnp.asarray(fg_lens),
                jnp.asarray(has_bg), params))
        assert (~has_bg).any() and has_bg.any()
        np.testing.assert_array_equal(fused[~has_bg], ref[~has_bg])
        tol = 2.0 ** -22 * max(np.abs(ref).max(), 1.0)
        assert np.abs(fused - ref).max() <= tol
        qf = np.clip(fused * 32767.0, -32768, 32767).astype(np.int16)
        qr = np.clip(ref * 32767.0, -32768, 32767).astype(np.int16)
        assert np.abs(qf.astype(np.int32) - qr.astype(np.int32)).max() <= 1

    def test_full_zero_offset_and_no_bg_paths(self):
        """q=0 passthrough and has_bg=False (no SNR scaling) both exact."""
        B, n = 4, 640
        fg, bg, _, _ = _inputs(B, n, seed=7)
        got = np.asarray(mix_gain_pallas(
            jnp.asarray(fg), jnp.asarray(bg),
            jnp.zeros(B, jnp.int32), jnp.full(B, 2.0, jnp.float32),
            jnp.zeros(B, bool), jnp.ones(B, jnp.float32),
            interpret=True))
        np.testing.assert_array_equal(
            got, fg.astype(np.float32) * (1.0 / 32768.0))

    def test_augment_batch_cpu_falls_back_to_xla(self):
        """On the CPU test backend augment_batch must not engage the
        kernel (mix_pallas_wanted is backend-gated) and still work."""
        from nanowakeword_tpu.ops.mix_pallas import mix_pallas_wanted
        assert not mix_pallas_wanted()
        B, n = 8, 1280
        fg, bg, fg_lens, has_bg = _inputs(B, n, seed=9)
        out = A.augment_batch(
            jax.random.PRNGKey(0), fg, bg,
            np.zeros((B, 100), np.float32), fg_lens, has_bg,
            np.zeros(B, bool),
            A.AugmentParams.from_settings({"rir_prob": 0.0}))
        assert out.shape == (B, n) and out.dtype == jnp.int16
