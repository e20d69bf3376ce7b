"""Fused Pallas TPU kernel for the log-mel frontend.

The XLA path (ops/mel.py) materialises the overlapping frame matrix
[B, T, 480] in HBM between the reshape/concat and the DFT matmuls — a 3x
write + read of the audio at HBM bandwidth. This kernel fuses the whole
frontend per grid cell:

    HBM audio --DMA--> VMEM span
      -> frames by reshape (three shifted views, zero gathers)
      -> [FT, 480] @ [480, 257] cos / sin   (MXU, bf16 x bf16 -> f32)
      -> power = re^2 + im^2                 (VPU)
      -> [FT, 257] @ [257, 32] mel filterbank (MXU)
      -> log10 + offset                      (VPU)
    -> VMEM out [FT, 32]

Overlapping windows (hop 160 < window 480) can't be expressed with a standard
BlockSpec index map, so the audio stays in ANY/HBM and each grid cell DMAs
its `FT*160 + 320`-sample span explicitly — the double-buffer-ready pattern
from the Pallas guide.

Numerics match ops/mel.py (same folded DFT/mel constants); equivalence is
tested in tests/test_mel_pallas.py. Falls back to the XLA path on hosts
without Mosaic support (`mel_frontend_fused` handles dispatch).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nanowakeword_tpu.ops import mel as melops

N_BINS = melops.N_FFT // 2 + 1   # 257
SPAN_EXTRA = melops.LEFT_PAD      # 320 extra samples per frame tile


def _kernel(audio_ref, cos_ref, sin_ref, fb_ref, out_ref, scratch, sem):
    """One grid cell: FT frames of one batch row.

    audio_ref is pre-reshaped [B, T+2, HOP] on the XLA side (a free
    bitcast), so the DMA lands 2-D in VMEM directly — Mosaic does not
    support 1-D -> 2-D reshapes of whole vectors in-kernel.

    The overlapping frame matrix is never materialised: since the window is
    3 hops, `frames @ W == sum_k r_k @ W_k` where r_k are the three
    row-shifted [FT, HOP] views of the span and W_k the matching [HOP, 257]
    slabs of the DFT basis. Three MXU matmuls per basis, zero concats (lane
    concatenation is what stalled the Mosaic compiler).
    """
    b = pl.program_id(0)
    j = pl.program_id(1)
    ft = out_ref.shape[1]

    dma = pltpu.make_async_copy(
        audio_ref.at[b, pl.ds(j * ft, ft + 2), :], scratch, sem)
    dma.start()
    dma.wait()

    def dft(basis_ref):
        acc = jnp.zeros((ft, N_BINS), jnp.float32)
        for k in range(3):
            r_k = scratch[k:k + ft, :].astype(jnp.bfloat16)
            acc = acc + jnp.dot(r_k, basis_ref[k],
                                preferred_element_type=jnp.float32)
        return acc

    re = dft(cos_ref)
    im = dft(sin_ref)
    power = re * re + im * im
    mel = jnp.dot(power.astype(jnp.bfloat16), fb_ref[:],
                  preferred_element_type=jnp.float32)
    out_ref[0, :, :] = (jnp.log10(jnp.maximum(mel, 0.0) + melops.MEL_EPS)
                        + melops.LOG_OFFSET)


def _frame_tile(t: int, max_tile: int = 128) -> int:
    """Largest divisor of t that is <= max_tile."""
    for ft in range(min(t, max_tile), 0, -1):
        if t % ft == 0:
            return ft
    return t


@functools.partial(jax.jit, static_argnames=("interpret",))
def mel_frontend_pallas(x: jnp.ndarray, *, interpret: bool = False):
    """[B, n] int16-scale audio -> [B, n//HOP, 32], fused on-chip.

    Same contract as ops/mel.mel_frontend (left-padded, n//HOP frames).
    """
    if x.ndim == 1:
        x = x[None]
    x = x.astype(jnp.float32)
    n = x.shape[-1]
    if n % melops.HOP != 0:
        x = jnp.pad(x, ((0, 0), (0, melops.HOP - n % melops.HOP)))
        n = x.shape[-1]
    b = x.shape[0]
    t = n // melops.HOP
    ft = _frame_tile(t)

    padded = jnp.pad(x, ((0, 0), (melops.LEFT_PAD, 0)))
    audio3d = padded.reshape(b, t + 2, melops.HOP)
    cos_m, sin_m, fb = melops._dft_mel_matrices("bfloat16")
    # split the [480, 257] bases into three [HOP, 257] slabs (one per
    # hop-block of the window)
    cos3 = np.asarray(cos_m).reshape(3, melops.HOP, N_BINS)
    sin3 = np.asarray(sin_m).reshape(3, melops.HOP, N_BINS)

    grid = (b, t // ft)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),     # audio stays in HBM
            pl.BlockSpec((3, melops.HOP, N_BINS), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, melops.HOP, N_BINS), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_BINS, melops.N_MELS), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ft, melops.N_MELS),
                               lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, melops.N_MELS), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((ft + 2, melops.HOP), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(audio3d, jnp.asarray(cos3), jnp.asarray(sin3), jnp.asarray(fb))
    return out


def mel_frontend_fused(x: jnp.ndarray) -> jnp.ndarray:
    """Pallas kernel on TPU backends; XLA fallback elsewhere."""
    try:
        backend = jax.default_backend()
    except Exception:  # noqa: BLE001
        backend = "cpu"
    if backend in ("tpu", "axon"):
        return mel_frontend_pallas(x)
    return melops.mel_frontend(x, compute_dtype=jnp.bfloat16)
