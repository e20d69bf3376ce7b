"""Fused Pallas TPU kernel for the log-mel frontend (hop-DFT, N_FFT=480).

One pipelined pass over the hop-block rows of the audio, reading each sample
once (as bfloat16), with all intermediates in VMEM:

    rows  = left-padded audio, reshaped [B, T_rows, 160]   (one hop per row)
    S     = rows_tile @ B0          (MXU: ONE cos + ONE sin dot per row)
    X[t]  = S[t] + phase_1*S[t+1] + phase_2*S[t+2]         (VPU, sublane rolls)
    Xw    = 0.5 X - 0.25 X(f-1) - 0.25 X(f+1)              (VPU, lane rolls)
    power = |Xw|^2                                          (VPU)
    mel   = power @ filterbank                              (MXU)
    out   = log10(mel + eps) + offset                       (VPU)

Design history (measured on a v5e, batch 4096 x 1 s, chained fori_loop,
value-fetch sync):
  * v1 (N_FFT=512): three shifted HBM copies of the audio, one [128,160]
    matmul set per grid cell — 372k clips/s (0.43x XLA): grid-cell overhead
    and copy traffic dominate.
  * v2 (N_FFT=512): no copies — six K=160 dots per frame tile with the
    window folded into per-hop basis slabs, boundary rows reconstructed by
    rolling the NEXT tile's products — 1,058k clips/s (1.23x the XLA
    frame-matrix route at 857k).
  * K=480 single-dot variants are NOT compilable: Mosaic rejects both
    dynamic_rotate and lane-concatenate on 160-lane bf16 vectors, so the
    [ft, 480] frame operand cannot be built in VMEM.
  * a fused cos|sin [160, 256] basis (3 dots instead of 6) measured +2.8% —
    marginal; not adopted.
  * v4 (this file, N_FFT=480): the hop-DFT factorization moves the DFT to
    ONE cos+sin dot pair per hop ROW — each row's spectrum is reused by the
    3 frames overlapping it via the analytic phase combine, and the Hann
    window becomes an exact 3-tap lane convolution (ops/mel.py). 3x fewer
    DFT MXU passes than v2; the added VPU work stays in registers.
    Measured (same-day A/B, v5e, batch 4096): v4 1,046k clips/s vs v2
    1,010k — parity-plus, NOT the hoped 3x: the kernel is VPU/overhead
    bound, not MXU bound. Kept for the simpler math, the exact (0.0 max
    err on hardware) XLA==Pallas==streaming agreement, and the MXU
    headroom it leaves for fusing the encoder's first conv in later.
    The XLA hop-DFT route is 431k vs the old frame-matrix 880k (the
    phase-combine materializes [B,T,128] intermediates in HBM); that
    route is the differentiable/CPU twin, not a perf path — every bulk
    inference call goes through this kernel.

The phase combine's row shifts reuse v2's boundary trick: rows t+1, t+2
past the tile edge come from the NEXT tile's dot products, selected with an
iota mask (single-tile shapes — 1-2 s clips — skip it entirely). The Hann
lane taps use pltpu.roll on the 128-lane f32 products (supported; the
bf16/160-lane rotates that blocked the K=480 route are not).

Numerics match ops/mel.py (same constants, same op order); equivalence is
tested in tests/test_mel_pallas.py (interpret mode) and on hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nanowakeword_tpu.ops import mel as melops


def _make_kernel(rows_per_cell: int, ft: int, with_next: bool):
    """Kernel over one (R-batch-rows, ft-frames) tile."""
    nb = melops.N_BINS

    def shifted(p, q, shift):
        # p rolled so row t reads row t+shift; wrapped rows come from the
        # next tile's products q (or stay as wrap garbage in the padding
        # frames of a single-tile shape).
        r = pltpu.roll(p, ft - shift, 0)
        if with_next:
            idx = jax.lax.broadcasted_iota(jnp.int32, p.shape, 0)
            r = jnp.where(idx < ft - shift, r, pltpu.roll(q, ft - shift, 0))
        return r

    def body(a, b, b0c_ref, b0s_ref, ph_ref, fb_ref, out_ref, r):
        s_re = jnp.dot(a, b0c_ref[:], preferred_element_type=jnp.float32)
        s_im = jnp.dot(a, b0s_ref[:], preferred_element_type=jnp.float32)
        if with_next:
            q_re = jnp.dot(b, b0c_ref[:], preferred_element_type=jnp.float32)
            q_im = jnp.dot(b, b0s_ref[:], preferred_element_type=jnp.float32)
        else:
            q_re = q_im = None

        f_re, f_im = s_re, s_im
        for k in (1, 2):
            pr = ph_ref[2 * (k - 1):2 * (k - 1) + 1]        # [1, nb]
            pi = ph_ref[2 * (k - 1) + 1:2 * (k - 1) + 2]
            rk_re = shifted(s_re, q_re, k)
            rk_im = shifted(s_im, q_im, k)
            f_re = f_re + pr * rk_re - pi * rk_im
            f_im = f_im + pr * rk_im + pi * rk_re

        # analytic Hann: 3-tap lane convolution (ops/mel.py hann_taps)
        lane = jax.lax.broadcasted_iota(jnp.int32, f_re.shape, 1)
        back_re = pltpu.roll(f_re, nb - 1, 1)               # out[l] = f[l+1]
        back_im = pltpu.roll(f_im, nb - 1, 1)
        m1_re = jnp.where(lane == 0, back_re, pltpu.roll(f_re, 1, 1))
        m1_im = jnp.where(lane == 0, -back_im, pltpu.roll(f_im, 1, 1))
        w_re = 0.5 * f_re - 0.25 * (m1_re + back_re)
        w_im = 0.5 * f_im - 0.25 * (m1_im + back_im)

        power = w_re * w_re + w_im * w_im
        mel = jnp.dot(power.astype(jnp.bfloat16), fb_ref[:],
                      preferred_element_type=jnp.float32)
        out_ref[r, :, :] = (jnp.log10(jnp.maximum(mel, 0.0) + melops.MEL_EPS)
                            + melops.LOG_OFFSET)

    if with_next:
        def kernel(a_ref, b_ref, b0c_ref, b0s_ref, ph_ref, fb_ref, out_ref):
            for r in range(rows_per_cell):
                body(a_ref[r], b_ref[r], b0c_ref, b0s_ref, ph_ref, fb_ref,
                     out_ref, r)
    else:
        def kernel(a_ref, b0c_ref, b0s_ref, ph_ref, fb_ref, out_ref):
            for r in range(rows_per_cell):
                body(a_ref[r], None, b0c_ref, b0s_ref, ph_ref, fb_ref,
                     out_ref, r)
    return kernel


@functools.partial(jax.jit,
                   static_argnames=("interpret", "rows_per_cell"))
def mel_frontend_pallas(x: jnp.ndarray, *, interpret: bool = False,
                        rows_per_cell: int = 32):
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

    b0c, b0s, p_re, p_im, fb = melops._hopdft_constants("bfloat16")
    nb = melops.N_BINS
    # phase rows interleaved [p1_re, p1_im, p2_re, p2_im] -> [4, nb] f32
    phase = jnp.asarray(np.stack([p_re[1], p_im[1], p_re[2], p_im[2]])
                        .astype(np.float32))

    tile_spec = pl.BlockSpec((r_cell, ft, melops.HOP),
                             lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM)
    const_specs = [
        pl.BlockSpec((melops.HOP, nb), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((melops.HOP, nb), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((4, nb), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nb, melops.N_MELS), lambda i, j: (0, 0),
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
    operands.extend([jnp.asarray(b0c), jnp.asarray(b0s), phase,
                     jnp.asarray(fb)])

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
    the XLA hop-DFT route elsewhere (or with NWW_TPU_PALLAS_MEL=0).

    INFERENCE path only — the kernel has no autodiff rule; gradient paths
    (e2e/pretrain training) keep ops/mel.mel_frontend.
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
