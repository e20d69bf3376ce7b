"""Fused Pallas TPU kernel for the log-mel frontend.

The XLA path (ops/mel.py) materialises the overlapping frame matrix
[B, T, 480] in HBM between the reshape/concat and the DFT matmuls — a 3x
write + read of the audio at HBM bandwidth. This kernel fuses the whole
frontend per grid cell:

    HBM audio --DMA--> VMEM span [FT+8, 160]
      -> three sublane-rolled views r_k (window = 3 hops; no frame matrix)
      -> sum_k r_k @ cos_k / sin_k        (MXU, bf16 x bf16 -> f32)
      -> power = re^2 + im^2              (VPU)
      -> power @ mel filterbank           (MXU)
      -> log10 + offset                   (VPU)
    -> VMEM out [FT, 32]

Mosaic constraints shaped the design (each was hit and worked around):
  * no 1-D -> 2-D reshape of VMEM values  -> audio pre-reshaped [B, T+2, HOP]
    on the XLA side (free bitcast);
  * no lane-axis concatenation            -> DFT decomposed over the three
    hop-blocks: frames @ W == sum_k r_k @ W_k;
  * DMA row slices must be 8-aligned      -> frame tiles FT are multiples of
    8, spans are FT+8 rows, row shifts done with pltpu.roll on the value.

Numerics match ops/mel.py (same folded DFT/mel constants); equivalence is
tested in tests/test_mel_pallas.py. `mel_frontend_fused` dispatches to the
XLA path on non-TPU backends.
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
ROW_PAD = 8                       # extra DMA rows (>= window - 1 hops, 8-aligned)


def _kernel(audio_ref, cos_ref, sin_ref, fb_ref, out_ref, scratch, sem):
    """One grid cell: FT frames of one batch row."""
    b = pl.program_id(0)
    j = pl.program_id(1)
    ft = out_ref.shape[1]

    dma = pltpu.make_async_copy(
        audio_ref.at[b, pl.ds(j * ft, ft + ROW_PAD), :], scratch, sem)
    dma.start()
    dma.wait()

    s = scratch[:, :]  # [FT+8, HOP]

    def dft(basis_ref):
        acc = jnp.zeros((ft, N_BINS), jnp.float32)
        rows = ft + ROW_PAD
        for k in range(3):
            # row-shift by k via sublane roll (shift must be non-negative:
            # rolling by rows-k moves row k to the top), then take the
            # leading FT rows (0-aligned static slice)
            shift = (rows - k) % rows
            r_k = pltpu.roll(s, shift=shift,
                             axis=0)[:ft, :].astype(jnp.bfloat16)
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


def _frame_tile(t: int, max_tile: int = 128, min_tile: int = 48) -> int:
    """8-aligned tile minimising padded length ceil(t/ft)*ft."""
    best_ft, best_cost = min_tile, None
    for ft in range(max_tile, min_tile - 1, -8):
        cost = -(-t // ft) * ft
        if best_cost is None or cost < best_cost:
            best_ft, best_cost = ft, cost
    return best_ft


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
    t_pad = -(-t // ft) * ft

    # rows: LEFT_PAD (2 rows) + t of audio + right pad to t_pad + ROW_PAD
    extra_rows = (t_pad - t) + ROW_PAD - 2
    padded = jnp.pad(x, ((0, 0), (melops.LEFT_PAD, extra_rows * melops.HOP)))
    audio3d = padded.reshape(b, t_pad + ROW_PAD, melops.HOP)

    cos_m, sin_m, fb = melops._dft_mel_matrices("bfloat16")
    cos3 = np.asarray(cos_m).reshape(3, melops.HOP, N_BINS)
    sin3 = np.asarray(sin_m).reshape(3, melops.HOP, N_BINS)

    grid = (b, t_pad // ft)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            # pin to HBM: ANY may promote small inputs to VMEM
            pl.BlockSpec(memory_space=pltpu.HBM),
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
        out_shape=jax.ShapeDtypeStruct((b, t_pad, melops.N_MELS),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((ft + ROW_PAD, melops.HOP), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(audio3d, jnp.asarray(cos3), jnp.asarray(sin3), jnp.asarray(fb))
    return out[:, :t]


def mel_frontend_fused(x: jnp.ndarray) -> jnp.ndarray:
    """Pallas kernel on TPU backends; XLA fallback elsewhere."""
    try:
        backend = jax.default_backend()
    except Exception:  # noqa: BLE001
        backend = "cpu"
    if backend in ("tpu", "axon"):
        return mel_frontend_pallas(x)
    return melops.mel_frontend(x, compute_dtype=jnp.bfloat16)
