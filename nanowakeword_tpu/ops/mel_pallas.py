"""Fused Pallas TPU kernel for the log-mel frontend.

The XLA path (ops/mel.py) materialises the overlapping frame matrix
[B, T, 480] in HBM between the reshape/concat and the DFT matmuls — a 3x
write + read of the audio at HBM bandwidth. This kernel fuses DFT, power,
mel projection and log compression into one pipelined pass:

    r_k = hop-rows view k of the audio      (XLA-side shifted slices)
      -> sum_k r_k @ cos_k / sin_k          (MXU, bf16 x bf16 -> f32)
      -> power = re^2 + im^2                (VPU)
      -> power @ mel filterbank             (MXU)
      -> log10 + offset                     (VPU)

Design notes (each constraint below was hit on real Mosaic and worked
around):
  * the 480-sample window is exactly 3 hops, so the frame matrix never needs
    to exist: ``frames @ W == sum_k r_k @ W_k`` over three row-shifted
    [T, 160] views and the matching [160, 257] DFT slabs. No lane concat
    (unsupported), no in-kernel reshape (unsupported).
  * overlapping windows can't be expressed by BlockSpec index maps, and
    manual HBM DMA slices require 8-aligned rows / 128-aligned lanes, which
    a 160-lane hop layout cannot satisfy — so the three shifted views are
    produced XLA-side (three contiguous copies) and fed through the standard
    pipelined BlockSpec path. HBM traffic is still ~2.5x lower than the XLA
    frame-matrix route.

Numerics match ops/mel.py (same folded constants); equivalence is tested in
tests/test_mel_pallas.py. `mel_frontend_fused` dispatches to the XLA path on
non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nanowakeword_tpu.ops import mel as melops



def _kernel(r0_ref, r1_ref, r2_ref, cos_ref, sin_ref, fb_ref, out_ref):
    """One grid cell: FT frames of one batch row."""
    views = (r0_ref, r1_ref, r2_ref)

    def dft(basis_ref):
        acc = None
        for k in range(3):
            r_k = views[k][0].astype(jnp.bfloat16)
            term = jnp.dot(r_k, basis_ref[k],
                           preferred_element_type=jnp.float32)
            acc = term if acc is None else acc + term
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

    extra = (t_pad - t) * melops.HOP
    padded = jnp.pad(x, ((0, 0), (melops.LEFT_PAD, extra)))
    rows = padded.reshape(b, t_pad + 2, melops.HOP)
    r0 = rows[:, 0:t_pad]          # window hop-block 0
    r1 = rows[:, 1:t_pad + 1]      # hop-block 1
    r2 = rows[:, 2:t_pad + 2]      # hop-block 2

    cos_m, sin_m, fb = melops._dft_mel_matrices("bfloat16")
    n_bins = np.asarray(cos_m).shape[-1]   # filterbank-pruned, 128-aligned
    cos3 = np.asarray(cos_m).reshape(3, melops.HOP, n_bins)
    sin3 = np.asarray(sin_m).reshape(3, melops.HOP, n_bins)

    view_spec = pl.BlockSpec((1, ft, melops.HOP), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM)
    grid = (b, t_pad // ft)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            view_spec, view_spec, view_spec,
            pl.BlockSpec((3, melops.HOP, n_bins), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, melops.HOP, n_bins), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_bins, melops.N_MELS), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ft, melops.N_MELS),
                               lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, melops.N_MELS),
                                       jnp.float32),
        interpret=interpret,
    )(r0, r1, r2, jnp.asarray(cos3), jnp.asarray(sin3), jnp.asarray(fb))
    return out[:, :t]


def mel_frontend_fused(x: jnp.ndarray) -> jnp.ndarray:
    """Best available fused mel path.

    Defaults to the XLA hop-block decomposition (ops/mel.mel_frontend_slab),
    which captures most of the HBM-traffic win portably. Set
    ``NWW_TPU_PALLAS_MEL=1`` to use the Pallas kernel on TPU backends —
    correct (tested in interpret mode) but subject to multi-minute Mosaic
    compile times on remote-compile deployments.
    """
    import os
    try:
        backend = jax.default_backend()
    except Exception:  # noqa: BLE001
        backend = "cpu"
    if (backend in ("tpu", "axon")
            and os.environ.get("NWW_TPU_PALLAS_MEL") == "1"):
        return mel_frontend_pallas(x)
    # Measured on v5e: the frame-matrix path wins (745k vs 438k 1-s clips/s
    # for the slab decomposition) — XLA fuses the frame concat into the
    # matmul operand read, and one K=480 matmul beats three K=160 ones.
    return melops.mel_frontend(x, compute_dtype=jnp.bfloat16)
