"""Fused Pallas mel kernel == XLA mel frontend (interpret mode on CPU CI).

The kernel itself was additionally validated and benchmarked on a real v5e
chip (max abs diff 0.0 vs the XLA path at batch 8; see mel_pallas.py header
and BENCH notes).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from nanowakeword_tpu.ops import mel as M
from nanowakeword_tpu.ops.mel_pallas import mel_frontend_pallas


@pytest.mark.parametrize("shape", [
    (1, 16000),    # 100 frames: single-tile kernel (no next-tile input)
    (3, 32000),    # 200 frames: multi-tile with cross-tile roll-fill
    (2, 64000),    # 400 frames: several tiles
    (5, 12345),    # non-HOP-multiple length, odd batch (rows_per_cell=5)
])
def test_matches_xla_frontend(rng, shape):
    x = rng.integers(-20000, 20000, shape).astype(np.float32)
    ref = np.asarray(M.mel_frontend(jnp.asarray(x),
                                    compute_dtype=jnp.bfloat16))
    out = np.asarray(mel_frontend_pallas(jnp.asarray(x), interpret=True))
    assert out.shape == ref.shape
    # identical folded bf16 constants; tolerance covers log-amplified
    # rounding of differently-ordered f32 partial sums near silent bins
    np.testing.assert_allclose(out, ref, atol=2e-3)


def test_tile_boundary_frames_exact(rng):
    """Frames straddling the 128-frame tile boundary must agree with the
    single-dispatch reference — the cross-tile roll-fill path."""
    x = rng.integers(-20000, 20000, (2, 48000)).astype(np.float32)  # 300 fr
    ref = np.asarray(M.mel_frontend(jnp.asarray(x),
                                    compute_dtype=jnp.bfloat16))
    out = np.asarray(mel_frontend_pallas(jnp.asarray(x), interpret=True))
    for boundary in (128, 256):
        seg = slice(boundary - 3, boundary + 3)
        np.testing.assert_allclose(out[:, seg], ref[:, seg], atol=2e-3)


def test_rows_per_cell_invariance(rng):
    x = rng.integers(-20000, 20000, (8, 16000)).astype(np.float32)
    a = np.asarray(mel_frontend_pallas(jnp.asarray(x), interpret=True,
                                       rows_per_cell=1))
    b = np.asarray(mel_frontend_pallas(jnp.asarray(x), interpret=True,
                                       rows_per_cell=8))
    np.testing.assert_array_equal(a, b)


def test_int16_input_matches_float(rng):
    """int16 audio (the product's native PCM dtype) gives bit-identical
    output to the same values fed as float32: int16 -> f32 is exact and
    the single f32 -> bf16 rounding happens in the same place."""
    x = rng.integers(-20000, 20000, (4, 16000)).astype(np.int16)
    a = np.asarray(mel_frontend_pallas(jnp.asarray(x), interpret=True))
    b = np.asarray(mel_frontend_pallas(jnp.asarray(x.astype(np.float32)),
                                       interpret=True))
    np.testing.assert_array_equal(a, b)


def test_1d_input_same_rank_as_xla_route(rng):
    """1-D input keeps ops/mel.mel_frontend's rank contract: [t, 32] out,
    so mel_frontend_fused has one shape regardless of backend."""
    x = rng.integers(-20000, 20000, 16000).astype(np.float32)
    out = np.asarray(mel_frontend_pallas(jnp.asarray(x), interpret=True))
    assert out.shape == (100, M.N_MELS)
    ref = np.asarray(M.mel_frontend(jnp.asarray(x),
                                    compute_dtype=jnp.bfloat16))
    assert out.shape == ref.shape


def test_bf16_output_matches_cast_f32(rng):
    """out_dtype=bfloat16 equals casting the f32 output — the rounding
    just moves into the kernel (used by bf16-encoder consumers)."""
    x = rng.integers(-20000, 20000, (4, 16000)).astype(np.int16)
    f32 = np.asarray(mel_frontend_pallas(jnp.asarray(x), interpret=True))
    b16 = np.asarray(mel_frontend_pallas(jnp.asarray(x), interpret=True,
                                         out_dtype=jnp.bfloat16))
    assert b16.dtype == np.dtype(jnp.bfloat16)
    np.testing.assert_array_equal(b16, f32.astype(jnp.bfloat16))
