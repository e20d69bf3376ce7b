"""Fused Pallas mel kernel == XLA mel frontend (interpret mode on CPU CI)."""

import jax.numpy as jnp
import numpy as np
import pytest

from nanowakeword_tpu.ops import mel as M
from nanowakeword_tpu.ops.mel_pallas import _frame_tile, mel_frontend_pallas


class TestFrameTile:
    def test_8_aligned_min_padding(self):
        # tiles are multiples of 8; padded length ceil(t/ft)*ft is minimised
        for t in (100, 104, 200, 256, 500):
            ft = _frame_tile(t)
            assert ft % 8 == 0 and 48 <= ft <= 128
        assert _frame_tile(100) == 104   # single tile, 4 frames padding
        assert _frame_tile(104) == 104
        assert _frame_tile(256) == 128


@pytest.mark.parametrize("shape", [(1, 16000), (3, 32000)])
def test_matches_xla_frontend(rng, shape):
    x = rng.integers(-20000, 20000, shape).astype(np.float32)
    ref = np.asarray(M.mel_frontend(jnp.asarray(x),
                                    compute_dtype=jnp.bfloat16))
    out = np.asarray(mel_frontend_pallas(jnp.asarray(x), interpret=True))
    assert out.shape == ref.shape
    # same folded constants, same bf16 matmuls; tolerance covers rounding
    np.testing.assert_allclose(out, ref, atol=0.02)


def test_1d_input_promoted(rng):
    x = rng.integers(-20000, 20000, 16000).astype(np.float32)
    out = np.asarray(mel_frontend_pallas(jnp.asarray(x), interpret=True))
    assert out.shape == (1, 100, M.N_MELS)
