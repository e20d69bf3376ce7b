"""Fused Pallas TPU kernel for the log-mel frontend (hop-DFT, N_FFT=480).

One pipelined pass over the hop-block rows of the audio, reading each sample
once, with all intermediates in VMEM:

    rows  = RAW audio, reshaped [B, T, 160] (free — no pad, no copy)
    S     = rows_tile @ B0          (MXU: ONE cos + ONE sin dot per row)
    X[t]  = phase2*S[t] + phase1*S[t-1] + S[t-2]           (VPU, sublane rolls;
            the t-1/t-2 taps of the first two frames are the stream's zero
            left-context, masked in-kernel — no host-side LEFT_PAD copy)
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
  * v4 (N_FFT=480): the hop-DFT factorization — ONE cos+sin dot pair per
    hop ROW, each row's spectrum reused by the 3 overlapping frames via the
    analytic phase combine, Hann as an exact 3-tap lane convolution
    (ops/mel.py). 1,046k clips/s vs v2's 1,010k same-day: parity-plus, NOT
    the hoped 3x — the kernel is input-traffic bound, not MXU bound.
  * v5 (this file): kill the input prep. v4 spent 0.38 us/clip (of 0.96)
    in the XLA pad+reshape+bf16-convert pass BEFORE the kernel (the kernel
    proper measured 0.23 us/clip on prebuilt rows). v5 feeds the RAW audio
    (any of int16/float32/bfloat16) reshaped [B, T, 160] — a free
    reshape — converts dtype in VMEM, and realizes the zero left-context
    by masking the rolled-in rows of the first two frames in-kernel
    (prev-tile products for multi-tile shapes). int16 input halves HBM
    reads again; values are bit-identical to the XLA route (int16 -> f32
    is exact, f32 -> bf16 rounds once, same as before). 1,275k clips/s.
    Multi-tile refinement: the prev-tile operand is an 8-row block at the
    tile edge (`shifted` only reads the last 2 rows), not the full tile —
    3 s clips went 991k -> 1,123k audio-sec/s, still bit-exact.
  * v6 (tried, REJECTED): flatten (batch, frame) into one row axis and run
    2 big [clips*T, 160] dots per cell with pos%T masks instead of R small
    per-row dots — measured 1,069-1,096k (c=8/16) vs v5's 1,275k, and
    c=32 exceeds the 16 MB scoped-VMEM limit: the monolithic cell body
    holds ~8 live [M,128] f32 temporaries, while the per-row loop's small
    temps let Mosaic pipeline rows through registers. Per-row wins.
  * v7 (tried, REJECTED): paired-hop rows — [t/2, 320] @ [320, 256]
    block-diagonal dots computing both hop phases at once to halve the
    per-row op count. Bit-exact, but 73k clips/s (17x SLOWER): the
    320-lane operand (pads to 384) plus the [R, 2, t/2, 32] output
    layout sends Mosaic into a pathological lowering. The per-op
    overhead hypothesis was right (t=128 tiles run 6.95 ns/frame vs
    8.10 at t=100) but this encoding of "bigger ops" is wrong.
  * FLOOR DECOMPOSITION (round 3, measured by stripping the kernel body
    stage-by-stage at batch 4096 x 1 s; baseline that day 860 ns/clip —
    the chip/relay ran ~8% slower than the round-2 1,275k session):
      log10+max epilogue ......... 0 ns   (859 vs 860 — free, fused)
      phase combine+Hann+power ... ~40 ns
      mel filterbank dot ......... ~175 ns (narrow-N [.,128]@[128,32])
      ONE input dot .............. ~0-7 ns over copy
      COPY-ONLY kernel ........... 684 ns  <- 80% of the total: the
        HBM->VMEM stream of [100,160]-row int16 tiles + the [100,32] f32
        writeback, NOT compute. Pure-XLA equivalent data movement runs
        316 ns/clip; the chip's practical elementwise bandwidth measured
        250-400 GB/s (xla int16 mul 264 ns, bf16 cast 247 ns).
    So v5 sits ~25% above the Pallas pipeline floor for this op shape and
    the levers named in round 2 (log10, per-row dispatch, lane padding)
    are each worth <5%. ~8.6 ns/frame is the honest floor of this design.
  * v8 (tried, REJECTED): fold phases + the Hann tridiagonal into six
    precomputed [160,128] bf16 bases (6 dots/row, combine shrinks to 2
    masked adds). VPU ops/row drop ~50 -> ~20 yet measured EQUAL to v5
    (1,166k vs 1,162k same-session) — consistent with the decomposition:
    the combine was never the cost. Also loses bit-exactness (rounding
    moves into the bases). Rejected.
  * v9 (tried, REJECTED): pack 4 hops per 640-lane row ([t/4, 640] input,
    zero-padded block-diagonal [640,512] cos/sin bases, combine as
    128-lane BLOCK rolls, [t/4, 128] packed mel output — every pipeline
    end lane-aligned). A copy-only probe of that layout runs 473 vs 684
    ns (the alignment win is real) but the FULL packed kernel measured
    911 ns vs v5's 869 same-session: the relayouted combine (512-lane
    rolls + block-wrap fixups) costs more than the aligned stream saves
    (v7 redux), and hardware accumulation over the zero-padded K=640 is
    NOT bit-equal to K=160 (MXU pass blocking; max err 1.2e-3). Rejected
    on both grounds.
  * v10 (SHIPPED): flatten only the TAIL. The input dots stay per-row
    (DMA-hidden), the combine stays per-row (VPU, ~40 ns), but power ->
    filterbank dot -> log10 -> store runs ONCE per cell on the
    concatenated [R*ft, 128] bf16 power block: one M=R*ft dot replaces R
    narrow-N dots and R [.,32]-lane stores. Bit-equal (M-blocking doesn't
    touch per-element accumulation order; hardware diff 0.0). Measured
    batch 4096 x 1 s same-session: f32 out 680 -> 567 ns/clip, bf16 out
    623 -> 518. This was the "per-row dispatch" lever round 2 named —
    v6's mistake was flattening the INPUT dots (which were never the
    cost) instead of the tail.

  * INPUT-LAYOUT REMEASURE (round 3, continued): copy-only probes of the
    shipped v10 store layout, same session: current [R,100,160] int16 in
    -> 362 ns/clip (the round-3 684 figure was a ~8%-slow session AND the
    v5-era per-row [.,32] stores), lane-aligned [R,125,128] -> 281,
    [R,25,640] -> 327, flat [R,16000] -> Mosaic compile crash. So the
    aligned-DMA ceiling is ~81 ns/clip below the current stream — but
    mapping the hop dots onto 128-lane rows needs 4-phase x 2-piece basis
    slabs (hop rows straddle lane-tile boundaries: u(t) = t + t//4),
    ~8x the input-dot MXU work (~330 ns unhidden, vs ~40 ns today,
    DMA-hidden) plus a changed K-accumulation order (bit-exactness lost,
    v9 redux). Traffic ceiling < compute cost: PARKED with arithmetic.
  * ENCODER-CONV1 FUSION (analyzed, NOT attempted — round 3): folding the
    wide128 encoder's first conv (10x32 -> 128, stride 2) into the kernel
    epilogue is blocked by the same Mosaic data-movement wall as v7/v9.
    The in-kernel mel block keeps time on SUBLANES; conv1 patches need
    sublane->lane folding ([t/2, 320] rows) or stride-2 row compaction,
    and the only expressible encodings are a block-diagonal selection dot
    (~25-90 ns/clip of pure overhead) or computing all t positions and
    writing [t, 128] back — 24.8 KB/clip, MORE boundary traffic than the
    unfused 6.2 KB mel writeback + conv round trip. Traffic-negative
    before any overcompute; see tools/profile_headline.py for the full
    arithmetic and the measured stage decomposition (conv1 = 142 ns of
    the 162 ns encoder; the CRNN tail, not the encoder, is the largest
    non-mel cost at 293 ns).

The phase combine's row shifts roll DOWN (frame t reads rows t-1, t-2):
wrapped rows are replaced by the PREVIOUS tile's products, selected with an
iota mask, and zeroed on the first tile (single-tile shapes — 1-2 s clips —
skip the second operand entirely). The Hann lane taps use pltpu.roll on the
128-lane f32 products.

Numerics match ops/mel.py exactly (same constants, same op order, same
one-step rounding); equivalence is tested in tests/test_mel_pallas.py
(interpret mode) and on hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nanowakeword_tpu.ops import mel as melops


def _make_kernel(rows_per_cell: int, ft: int, with_prev: bool):
    """Kernel over one (R-batch-rows, ft-frames) tile."""
    nb = melops.N_BINS

    def make_masks():
        # loop-invariant masks, built ONCE per cell (the row loop is
        # unrolled rows_per_cell times; recomputing iotas/compares per row
        # is pure VPU waste): row-index masks for the two phase shifts +
        # the lane-0 mask for the Hann conjugate edge.
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (ft, nb), 0)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (ft, nb), 1)
        return (row_iota >= 1, row_iota >= 2, lane_iota == 0)

    def shifted(p, q, shift, first_tile, masks):
        # p rolled down so frame t reads row t-shift; the first `shift`
        # frames read the PREVIOUS tile's last rows (q, a [ft, nb] array
        # whose TOP 2 rows hold the prev tile's last-2-row spectra), or the
        # stream's zero left-context on the first tile.
        r = pltpu.roll(p, shift, 0)
        mask = masks[1] if shift == 2 else masks[0]
        if with_prev:
            qk = q if shift == 2 else pltpu.roll(q, ft - 1, 0)
            prev = jnp.where(first_tile, 0.0, qk)
            return jnp.where(mask, r, prev)
        return jnp.where(mask, r, 0.0)

    def body(a, b, b0c_ref, b0s_ref, ph_ref, first_tile, masks):
        s_re = jnp.dot(a, b0c_ref[:], preferred_element_type=jnp.float32)
        s_im = jnp.dot(a, b0s_ref[:], preferred_element_type=jnp.float32)
        if with_prev:
            # only the prev tile's LAST 2 rows are ever read: b is an
            # 8-row block ending at the prev tile's edge (Mosaic's minimum
            # sublane granularity), so the cross-tile dots are [8,160]
            # instead of the full-tile [ft,160] pair — 16x less MXU work
            # and prev-tile HBM traffic than the full-tile operand cost.
            # The last 2 spectra pad up to [ft, nb] for `shifted`'s masks.
            q8_re = jnp.dot(b, b0c_ref[:],
                            preferred_element_type=jnp.float32)
            q8_im = jnp.dot(b, b0s_ref[:],
                            preferred_element_type=jnp.float32)
            zpad = jnp.zeros((ft - 2, nb), jnp.float32)
            q_re = jnp.concatenate([q8_re[6:8], zpad], axis=0)
            q_im = jnp.concatenate([q8_im[6:8], zpad], axis=0)
        else:
            q_re = q_im = None

        # frame t = S[t-2] + ph1*S[t-1] + ph2*S[t]  (ops/mel.py, with the
        # padded-row index p = raw row + 2: phase_k multiplies padded row
        # t+k, i.e. raw row t+k-2). Accumulation ORDER matches
        # _log_mel_from_rows term-for-term so the f32 rounding is identical
        # and hardware output is bit-equal to the XLA route.
        ph1_re = ph_ref[0:1]
        ph1_im = ph_ref[1:2]
        ph2_re = ph_ref[2:3]
        ph2_im = ph_ref[3:4]
        f_re = shifted(s_re, q_re, 2, first_tile, masks)
        f_im = shifted(s_im, q_im, 2, first_tile, masks)
        r1_re = shifted(s_re, q_re, 1, first_tile, masks)
        r1_im = shifted(s_im, q_im, 1, first_tile, masks)
        f_re = f_re + ph1_re * r1_re - ph1_im * r1_im
        f_im = f_im + ph1_re * r1_im + ph1_im * r1_re
        f_re = f_re + ph2_re * s_re - ph2_im * s_im
        f_im = f_im + ph2_re * s_im + ph2_im * s_re

        # analytic Hann: 3-tap lane convolution (ops/mel.py hann_taps)
        back_re = pltpu.roll(f_re, nb - 1, 1)               # out[l] = f[l+1]
        back_im = pltpu.roll(f_im, nb - 1, 1)
        m1_re = jnp.where(masks[2], back_re, pltpu.roll(f_re, 1, 1))
        m1_im = jnp.where(masks[2], -back_im, pltpu.roll(f_im, 1, 1))
        w_re = 0.5 * f_re - 0.25 * (m1_re + back_re)
        w_im = 0.5 * f_im - 0.25 * (m1_im + back_im)

        power = w_re * w_re + w_im * w_im
        return power.astype(jnp.bfloat16)

    def tail(powers, fb_ref, out_ref):
        # v10: ONE cell-level filterbank dot + log10 + write instead of R
        # per-row [ft,128]@[128,32] dots. M-dim blocking doesn't change
        # per-element accumulation order, so this is bit-equal to the
        # per-row tail — but the narrow-N dot and the [.,32] stores run
        # once per cell instead of R times (measured: 680 -> 567 ns/clip
        # f32, 623 -> 518 bf16, batch 4096 x 1 s, same session).
        pw = jnp.concatenate(powers, axis=0)              # [R*ft, 128]
        mel = jnp.dot(pw, fb_ref[:], preferred_element_type=jnp.float32)
        mel = mel.reshape(len(powers), ft, melops.N_MELS)
        logmel = (jnp.log10(jnp.maximum(mel, 0.0) + melops.MEL_EPS)
                  + melops.LOG_OFFSET)
        out_ref[:] = logmel.astype(out_ref.dtype)

    def convert(block):
        # one cell-level elementwise convert (int16/f32 -> bf16 in VMEM)
        # instead of R per-row converts
        if block.dtype == jnp.bfloat16:
            return block
        return block.astype(jnp.float32).astype(jnp.bfloat16)

    if with_prev:
        def kernel(a_ref, b_ref, b0c_ref, b0s_ref, ph_ref, fb_ref, out_ref):
            first = pl.program_id(1) == 0
            masks = make_masks()
            a = convert(a_ref[:])
            b = convert(b_ref[:])
            powers = [body(a[r], b[r], b0c_ref, b0s_ref, ph_ref,
                           first, masks)
                      for r in range(rows_per_cell)]
            tail(powers, fb_ref, out_ref)
    else:
        def kernel(a_ref, b0c_ref, b0s_ref, ph_ref, fb_ref, out_ref):
            masks = make_masks()
            a = convert(a_ref[:])
            powers = [body(a[r], None, b0c_ref, b0s_ref, ph_ref,
                           None, masks)
                      for r in range(rows_per_cell)]
            tail(powers, fb_ref, out_ref)
    return kernel


@functools.partial(jax.jit,
                   static_argnames=("interpret", "rows_per_cell",
                                    "out_dtype"))
def mel_frontend_pallas(x: jnp.ndarray, *, interpret: bool = False,
                        rows_per_cell: int = 32, out_dtype=jnp.float32):
    """[B, n] int16-scale audio -> [B, n//HOP, 32], fused on-chip.

    Same contract as ops/mel.mel_frontend (zero left context, n//HOP
    frames). Accepts int16, float32, or bfloat16 input; int16 is the
    cheapest (half the HBM reads) and is what the product's audio decode
    produces (utils/audio_io.py). `out_dtype=bfloat16` halves the output
    write for consumers that cast anyway (the bf16 encoder): the values
    are bit-identical to casting the f32 output — the rounding just moves
    into the kernel.
    """
    squeeze = x.ndim == 1
    if squeeze:
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

    single = t <= 128
    if single:
        ft, grid_t = t, 1
        rows = x.reshape(b, t, melops.HOP)            # free reshape
    else:
        ft = 128
        grid_t = -(-t // ft)
        pad_rows = grid_t * ft - t
        if pad_rows:
            x = jnp.pad(x, ((0, 0), (0, pad_rows * melops.HOP)))
        rows = x.reshape(b, grid_t * ft, melops.HOP)

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
        # the LAST 8 rows of the previous frame tile (`shifted` only reads
        # the final 2; 8 is Mosaic's minimum sublane block): block index
        # j*ft/8 - 1 on an 8-row grid ends exactly at the prev tile edge
        # (clamped on the first tile, where the kernel zero-masks the
        # rolled-in rows instead).
        eighth = ft // 8
        in_specs.append(pl.BlockSpec(
            (r_cell, 8, melops.HOP),
            lambda i, j: (i, jnp.maximum(j * eighth - 1, 0), 0),
            memory_space=pltpu.VMEM))
        operands.append(rows)
    in_specs.extend(const_specs)
    operands.extend([jnp.asarray(b0c), jnp.asarray(b0s), phase,
                     jnp.asarray(fb)])

    out = pl.pallas_call(
        _make_kernel(r_cell, ft, with_prev=not single),
        grid=(b // r_cell, grid_t),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((r_cell, ft, melops.N_MELS),
                               lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, grid_t * ft, melops.N_MELS),
                                       out_dtype),
        interpret=interpret,
    )(*operands)
    out = out if single else out[:, :t]
    return out[0] if squeeze else out


def mel_frontend_fused(x: jnp.ndarray, *,
                       out_dtype=jnp.float32) -> jnp.ndarray:
    """Best available fused mel path: the Pallas kernel on TPU backends,
    the XLA hop-DFT route elsewhere (or with NWW_TPU_PALLAS_MEL=0).

    INFERENCE path only — the kernel has no autodiff rule; gradient paths
    (e2e/pretrain training) keep ops/mel.mel_frontend. Pass
    out_dtype=bfloat16 when the consumer casts to bf16 anyway (identical
    values, half the intermediate HBM traffic).
    """
    import os
    try:
        backend = jax.default_backend()
    except Exception:  # noqa: BLE001
        backend = "cpu"
    if (backend in ("tpu", "axon")
            and os.environ.get("NWW_TPU_PALLAS_MEL", "1") == "1"):
        return mel_frontend_pallas(x, rows_per_cell=32, out_dtype=out_dtype)
    return melops.mel_frontend(
        x, compute_dtype=jnp.bfloat16).astype(out_dtype)
