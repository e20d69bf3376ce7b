"""Speech-embedding encoder: mel frames -> 96-dim acoustic embeddings.

The reference uses Google's frozen `speech_embedding` ONNX model
(`/root/reference/nanowakeword/data/AudioFeatures.py:172-183`): it slices the
mel sequence into 76-frame windows at stride 8 and runs each window through a
conv net, producing one 96-dim vector per window. The batch path materializes
every window — a 9.5x data blow-up — and the streaming path re-runs the whole
window every 80 ms.

TPU-native redesign: the encoder is a **fully-convolutional** stack whose
total time stride is exactly 8 and receptive field exactly 76, with VALID
padding. Applying it once over the whole mel sequence yields one embedding
per stride-8 window position — identical, by construction, to windowed
application (tested in tests/test_embedding.py), with zero duplication. The
per-window contract (76 frames -> 1x96) survives, so every downstream shape
in the framework matches the reference: ``n_frames = (mel_frames - 76)//8 + 1``
(`AudioFeatures.py:265`).

Time geometry:  k=10/s=2 -> k=8/s=2 -> k=8/s=2 -> k=4/s=1
    receptive field = 10 + 7*2 + 7*4 + 3*8 = 76,   stride = 2*2*2*1 = 8
Freq geometry (32 mel bins): k=4/s=2 -> k=4/s=2 -> k=3/s=2 -> k=2/s=1 -> 1

The encoder is our own trainable module (~0.2M params, comparable to the
reference's frozen asset). It can be trained end-to-end or frozen from a
pretrained checkpoint; either way the [B, T, 96] feature interface that the
rest of the framework consumes is unchanged.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

EMBEDDING_DIM = 96
EMB_WINDOW = 76     # mel frames per embedding window
EMB_STRIDE = 8      # mel frames between embedding windows


def n_embedding_frames(n_mel_frames: int) -> int:
    """Embeddings produced for a mel sequence (AudioFeatures.py:265 contract)."""
    if n_mel_frames < EMB_WINDOW:
        return 0
    return (n_mel_frames - EMB_WINDOW) // EMB_STRIDE + 1


class SpeechEmbeddingEncoder(nn.Module):
    """Fully-convolutional mel -> 96-dim embedding encoder.

    Input:  [B, T, 32]  transformed log-mel (T >= 76)
    Output: [B, (T-76)//8 + 1, 96]

    `precision` defaults to HIGH (three-pass bfloat16): XLA's DEFAULT TPU
    conv precision rounds f32 operands to a single bfloat16 MXU pass whose
    algorithm choice is shape-dependent, which can break the streaming ==
    batch guarantee (measured at the ~5e-3 level for some geometries). HIGH
    recovers ~f32 mantissa coverage — measured worst cross-shape error
    2.5e-5 between the [B,76,32] streaming window and [B,970,32] full-buffer
    shapes, 40x inside the 1e-3 score-trace budget — at ~1/6 the MXU cost of
    HIGHEST (f32 emulation), which this encoder previously defaulted to.
    Throughput-critical bulk extraction can opt into `precision=None` (one
    bf16 pass) where 0.5% feature noise is irrelevant; bit-for-bit
    cross-shape reproducibility needs `precision=jax.lax.Precision.HIGHEST`.
    """

    features: tuple = (32, 48, 64, EMBEDDING_DIM)
    dtype: jnp.dtype = jnp.float32
    precision: object = jax.lax.Precision.HIGH

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        x = mel[..., None].astype(self.dtype)  # [B, T, 32, 1] (NHWC: H=time, W=freq)
        specs = [
            ((10, 4), (2, 2)),
            ((8, 4), (2, 2)),
            ((8, 3), (2, 2)),
            ((4, 2), (1, 1)),
        ]
        for feats, (kernel, stride) in zip(self.features, specs):
            x = nn.Conv(feats, kernel_size=kernel, strides=stride,
                        padding="VALID", dtype=self.dtype,
                        precision=self.precision)(x)
            x = nn.relu(x)
        # [B, T', 1, 96] -> [B, T', 96]; final linear mixes channels per frame
        x = x.squeeze(axis=2)
        x = nn.Dense(EMBEDDING_DIM, dtype=self.dtype,
                     precision=self.precision)(x)
        return x
