"""Fused Pallas TPU kernel for the log-mel frontend.

The XLA path (ops/mel.py) materialises the overlapping frame matrix
[B, T, 480] in HBM between the reshape/concat and the DFT matmuls — a 3x
write + read of the audio at HBM bandwidth. This kernel fuses DFT, power,
mel projection and log compression into one pipelined pass over the
hop-block rows of the audio, reading each sample once (as bfloat16):

    rows  = left-padded audio, reshaped [B, T_rows, 160]   (one hop per row)
    P_k   = rows_tile @ basis_k          (MXU, bf16 x bf16 -> f32; k = 0..2)
    re/im = P_0 + roll(P_1,-1) + roll(P_2,-2)   (the 480-window as 3 hops)
    power = re^2 + im^2                  (VPU)
    mel   = power @ filterbank           (MXU)
    out   = log10(mel + eps) + offset    (VPU)

Design notes (v2 — v1 materialised three shifted copies of the audio and ran
one [128,160] matmul set per grid cell; measured 0.43x the XLA path because
grid-cell overhead and the copy traffic dominated):
  * NO shifted copies: frame t needs rows t, t+1, t+2. Inside a tile the
    shift is a roll of the PRODUCT (P_k live in [ft, 128]-lane registers,
    roll is cheap on the VPU); across tile boundaries the wrapped rows are
    filled from the NEXT tile's products (second BlockSpec on the same
    array, index j+1), selected with an iota mask. For clips whose whole
    frame count fits one tile (1-s/2-s audio), the boundary case vanishes
    and the next-tile input is skipped entirely — 6 matmuls per row, one
    read of the audio.
  * multiple batch rows per grid cell (rows_per_cell, default 16) amortise
    per-cell dispatch overhead; the in-kernel loop unrolls.
  * rows are cast to bf16 XLA-side: halves kernel HBM traffic; identical
    numerics to the XLA path, which also feeds the MXU bf16 (exact match
    tested).
  * lane width 160 (one hop) is not 128-aligned; Mosaic pads reads — still
    measured faster than any 128-lane relayout that needs a copy.

Numerics match ops/mel.py exactly (same folded bf16 constants); equivalence
is tested in tests/test_mel_pallas.py (interpret mode) and was verified on
a real v5e chip (max abs diff 0.0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nanowakeword_tpu.ops import mel as melops


def _apply_mel(power, fb_ref, out_ref, r):
    mel = jnp.dot(power.astype(jnp.bfloat16), fb_ref[:],
                  preferred_element_type=jnp.float32)
    out_ref[r, :, :] = (jnp.log10(jnp.maximum(mel, 0.0) + melops.MEL_EPS)
                        + melops.LOG_OFFSET)


def _make_kernel(rows_per_cell: int, ft: int, with_next: bool):
    """Kernel over one (R-batch-rows, ft-frames) tile."""

    def shifted_sum(p0, p1, p2, q1, q2):
        # re/im[t] = p0[t] + p1[t+1] + p2[t+2]; rows t+s beyond the tile come
        # from the next tile's products q (roll wraps them to t >= ft-s).
        # pltpu.roll needs non-negative shifts: roll by ft-s == roll by -s.
        r1 = pltpu.roll(p1, ft - 1, 0)
        r2 = pltpu.roll(p2, ft - 2, 0)
        if with_next:
            idx = jax.lax.broadcasted_iota(jnp.int32, p0.shape, 0)
            r1 = jnp.where(idx < ft - 1, r1, pltpu.roll(q1, ft - 1, 0))
            r2 = jnp.where(idx < ft - 2, r2, pltpu.roll(q2, ft - 2, 0))
        # else: wrapped rows land in frames >= ft-2 >= t, which are padding
        return p0 + r1 + r2

    if with_next:
        def kernel(a_ref, b_ref, cos_ref, sin_ref, fb_ref, out_ref):
            for r in range(rows_per_cell):
                a = a_ref[r]
                b = b_ref[r]
                re = shifted_sum(
                    jnp.dot(a, cos_ref[0], preferred_element_type=jnp.float32),
                    jnp.dot(a, cos_ref[1], preferred_element_type=jnp.float32),
                    jnp.dot(a, cos_ref[2], preferred_element_type=jnp.float32),
                    jnp.dot(b, cos_ref[1], preferred_element_type=jnp.float32),
                    jnp.dot(b, cos_ref[2], preferred_element_type=jnp.float32))
                im = shifted_sum(
                    jnp.dot(a, sin_ref[0], preferred_element_type=jnp.float32),
                    jnp.dot(a, sin_ref[1], preferred_element_type=jnp.float32),
                    jnp.dot(a, sin_ref[2], preferred_element_type=jnp.float32),
                    jnp.dot(b, sin_ref[1], preferred_element_type=jnp.float32),
                    jnp.dot(b, sin_ref[2], preferred_element_type=jnp.float32))
                _apply_mel(re * re + im * im, fb_ref, out_ref, r)
    else:
        def kernel(a_ref, cos_ref, sin_ref, fb_ref, out_ref):
            for r in range(rows_per_cell):
                a = a_ref[r]
                re = shifted_sum(
                    jnp.dot(a, cos_ref[0], preferred_element_type=jnp.float32),
                    jnp.dot(a, cos_ref[1], preferred_element_type=jnp.float32),
                    jnp.dot(a, cos_ref[2], preferred_element_type=jnp.float32),
                    None, None)
                im = shifted_sum(
                    jnp.dot(a, sin_ref[0], preferred_element_type=jnp.float32),
                    jnp.dot(a, sin_ref[1], preferred_element_type=jnp.float32),
                    jnp.dot(a, sin_ref[2], preferred_element_type=jnp.float32),
                    None, None)
                _apply_mel(re * re + im * im, fb_ref, out_ref, r)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("interpret", "rows_per_cell"))
def mel_frontend_pallas(x: jnp.ndarray, *, interpret: bool = False,
                        rows_per_cell: int = 16):
    """[B, n] int16-scale audio -> [B, n//HOP, 32], fused on-chip.

    Same contract as ops/mel.mel_frontend (left-padded, n//HOP frames).
    """
    if x.ndim == 1:
        x = x[None]
    n = x.shape[-1]
    if n % melops.HOP != 0:
        x = jnp.pad(x, ((0, 0), (0, melops.HOP - n % melops.HOP)))
        n = x.shape[-1]
    b = x.shape[0]
    t = n // melops.HOP

    # R batch rows per grid cell (largest divisor of b up to the request)
    r_cell = next(d for d in range(min(rows_per_cell, b), 0, -1)
                  if b % d == 0)

    single = (t + 2) <= 128
    ft = -(-max(t + 2, 8) // 8) * 8 if single else 128
    grid_t = 1 if single else -(-t // ft)
    # rows: [B, T_rows, HOP]; frame t reads rows t, t+1, t+2 of the
    # LEFT_PAD-shifted layout. Multi-tile mode keeps one extra zero tile so
    # the (j+1) BlockSpec stays in bounds on the last tile.
    t_rows = ft * (grid_t if single else grid_t + 1)
    pad_tail = t_rows * melops.HOP - n - melops.LEFT_PAD
    padded = jnp.pad(x.astype(jnp.float32),
                     ((0, 0), (melops.LEFT_PAD, pad_tail)))
    rows = padded.reshape(b, t_rows, melops.HOP).astype(jnp.bfloat16)

    cos_m, sin_m, fb = melops._dft_mel_matrices("bfloat16")
    n_bins = np.asarray(cos_m).shape[-1]   # filterbank-pruned, 128-aligned
    cos3 = jnp.asarray(np.asarray(cos_m).reshape(3, melops.HOP, n_bins))
    sin3 = jnp.asarray(np.asarray(sin_m).reshape(3, melops.HOP, n_bins))

    tile_spec = pl.BlockSpec((r_cell, ft, melops.HOP),
                             lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM)
    const_specs = [
        pl.BlockSpec((3, melops.HOP, n_bins), lambda i, j: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, melops.HOP, n_bins), lambda i, j: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n_bins, melops.N_MELS), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    in_specs = [tile_spec]
    operands = [rows]
    if not single:
        in_specs.append(pl.BlockSpec((r_cell, ft, melops.HOP),
                                     lambda i, j: (i, j + 1, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(rows)
    in_specs.extend(const_specs)
    operands.extend([cos3, sin3, jnp.asarray(fb)])

    out = pl.pallas_call(
        _make_kernel(r_cell, ft, with_next=not single),
        grid=(b // r_cell, grid_t),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((r_cell, ft, melops.N_MELS),
                               lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, grid_t * ft, melops.N_MELS),
                                       jnp.float32),
        interpret=interpret,
    )(*operands)
    return out[:, :t]


def mel_frontend_fused(x: jnp.ndarray) -> jnp.ndarray:
    """Best available fused mel path: the Pallas kernel on TPU backends,
    the XLA frame-matrix route elsewhere (or with NWW_TPU_PALLAS_MEL=0).

    Measured on a real v5e (batch 4096 x 1 s, chained fori_loop, value-fetch
    sync): Pallas v2 1,058k clips/s vs XLA frame-matrix 857k (1.23x), with
    bit-identical output at single-tile shapes. INFERENCE path only — the
    kernel has no autodiff rule; gradient paths (e2e/pretrain training)
    keep ops/mel.mel_frontend.
    """
    import os
    try:
        backend = jax.default_backend()
    except Exception:  # noqa: BLE001
        backend = "cpu"
    if (backend in ("tpu", "axon")
            and os.environ.get("NWW_TPU_PALLAS_MEL", "1") == "1"):
        return mel_frontend_pallas(x, rows_per_cell=32)
    return melops.mel_frontend(x, compute_dtype=jnp.bfloat16)
