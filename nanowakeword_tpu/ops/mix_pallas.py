"""Fused SNR-mix + gain Pallas kernel: the augmentation pre-stage in ONE
HBM pass.

Reference semantics (`/root/reference/nanowakeword/data/augment_clips.py`
`_mix_snr` :45-79 + placement :218-231 + Gain): place the foreground into
the background at a random offset with a target SNR, then apply a gated
random gain. The XLA formulation (ops/augment._augment_pre) spends ~3.6 ms
per 2048 x 16000 batch on the TPU: int16->f32 conversion materializes the
batch, the two RMS reductions re-read it, the 128-aligned block shift is a
per-clip one-hot MXU dot (one [nb, nb] selector construct + a 3-pass
HIGHEST-precision contraction), and the mix/gain elementwise pass reads
and writes everything again.

This kernel does the whole thing touching HBM once per operand: each grid
cell streams r_cell foreground rows (int16, HALF the read traffic) and
background rows into VMEM, converts, shifts by the per-clip block offset
with `pltpu.roll` on the [nb, 128] sublane axis (pure register/VMEM data
movement — no selector matmul at all), applies the precomputed per-clip
SNR scale and gain, and writes the mixed row. Per-clip scalars (block
offset, scale, has_bg, gain) ride the scalar-prefetch path in SMEM.

NUMERICS: every per-element operation matches the XLA chain (astype +
*(1/32768) convert, bg + shifted*scale, *gain; the gated gain lowers to
an unconditional multiply by a gated-to-1.0 factor — exact for finite
audio), and the RMS/scale/draw scalars are computed OUTSIDE in the same
vectorized ops the vmapped chain uses. Clips without a background are
ARRAY-EQUAL to `vmap(_augment_pre)`; mixed clips can differ by 1 ulp in
`bg + shifted*scale` because XLA's FMA-contraction choice (one rounding
vs two) differs between the two graphs — measured <= 2 ulp, <= 1 LSB
after the chain's int16 quantization, and asserted at those bounds in
tests/test_mix_pallas.py.

MEASURED NEGATIVE (round 5, v5e-1, 2048 x 16000 int16, 16 chained
steps/sync, two sessions — tools/probe_mix_kernel.py): standalone
pre-stage XLA chain 2.88/2.95 ms vs kernel 3.01/3.01 ms; FULL config-3
bf16 step 11.15/11.09 ms (XLA) vs 11.09/11.05 ms (kernel) — a ~2%
standalone loss and a full-step wash within relay noise. The round-4
prediction (XLA pre-stage 3.12 ms + ~0.5 ms int16 convert, kernel wins
one HBM pass) did not survive measurement: after the producer
optimization_barrier and 128-sample placement quantization landed, XLA
already fuses convert+shift+mix+gain into ~one pass, and the kernel's
int16-read saving is offset by its grid/roll overhead. Default therefore
FLIPPED OFF (round 5): the simpler XLA chain is the default path;
NWW_TPU_PALLAS_MIX=1 opts the kernel in (outputs are equal within 1 ulp
pre-quantization, test_mix_pallas.py, so either path is safe).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INT16_SCALE = 1.0 / 32768.0


def _make_kernel(r_cell: int, nb: int, int_in: bool):
    # tpu.dynamic_rotate requires 8-aligned sublane counts (125 rows fails
    # AOT with "unsupported unaligned shape"): roll on a zero-padded
    # [nb8, 128] and slice back. Rows the wrap brings in land only below
    # q, where the iota mask zero-fills anyway.
    nb8 = -(-nb // 8) * 8

    def kernel(q_ref, scale_ref, hasbg_ref, gain_ref,
               fg_ref, bg_ref, out_ref):
        cell = pl.program_id(0)
        for i in range(r_cell):
            idx = cell * r_cell + i
            row = fg_ref[i].astype(jnp.float32)
            if int_in:
                row = row * _INT16_SCALE
            q = q_ref[idx]
            # out[s] = row[s - q], rows below q zero-filled: a sublane roll
            # plus an iota mask (wrapped-in rows land only below q)
            if nb8 != nb:
                row = jnp.pad(row, ((0, nb8 - nb), (0, 0)))
            rolled = pltpu.roll(row, q, 0)[:nb]
            keep = jax.lax.broadcasted_iota(jnp.int32, (nb, 128), 0) >= q
            shifted = jnp.where(keep, rolled, 0.0)
            mixed = jnp.where(hasbg_ref[idx] != 0,
                              bg_ref[i] + shifted * scale_ref[idx],
                              shifted)
            out_ref[i] = mixed * gain_ref[idx]
    return kernel


@functools.partial(jax.jit,
                   static_argnames=("r_cell", "interpret"))
def mix_gain_pallas(fg: jnp.ndarray, bg: jnp.ndarray, q: jnp.ndarray,
                    scale: jnp.ndarray, has_bg: jnp.ndarray,
                    gain: jnp.ndarray, *, r_cell: int = 16,
                    interpret: bool = False) -> jnp.ndarray:
    """[B, n] fg (int16 or unit-scale f32) + [B, n] bg f32 -> mixed f32.

    out[b] = (has_bg[b] ? bg[b] + shift(fg_unit[b], 128*q[b]) * scale[b]
                        : shift(fg_unit[b], 128*q[b])) * gain[b]

    Requires n % 128 == 0; q[b] in [0, n//128). `r_cell` rows per grid
    cell (largest divisor of B is used).
    """
    B, n = fg.shape
    assert n % 128 == 0, n
    nb = n // 128
    r = next(d for d in range(min(r_cell, B), 0, -1) if B % d == 0)
    int_in = jnp.issubdtype(fg.dtype, jnp.integer)

    row_spec = pl.BlockSpec((r, nb, 128), lambda i, *_: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B // r,),
        in_specs=[row_spec, row_spec],
        out_specs=row_spec,
    )
    return pl.pallas_call(
        _make_kernel(r, nb, int_in),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, nb, 128), jnp.float32),
        interpret=interpret,
    )(q.astype(jnp.int32), scale.astype(jnp.float32),
      has_bg.astype(jnp.int32), gain.astype(jnp.float32),
      fg.reshape(B, nb, 128), bg.reshape(B, nb, 128),
      ).reshape(B, n)


def mix_pallas_wanted() -> bool:
    """Kernel path gate: TPU backend + env OPT-IN (NWW_TPU_PALLAS_MIX=1).

    Default off — the measured-negative A/B in the module docstring: the
    XLA chain matches or beats the kernel on the real chip, so the
    simpler path is the default."""
    try:
        backend = jax.default_backend()
    except Exception:  # noqa: BLE001
        backend = "cpu"
    return (backend in ("tpu", "axon")
            and os.environ.get("NWW_TPU_PALLAS_MIX", "0") == "1")
