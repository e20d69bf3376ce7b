"""TPU-native log-mel frontend.

This is the acoustic core of nanowakeword-tpu. The reference implementation
(`/root/reference/nanowakeword/data/AudioFeatures.py:124-153`) delegates the
mel-spectrogram to an opaque ONNX model with the contract: 16 kHz int16 PCM in,
32 mel bins out at ~100 frames/sec, post-transformed with ``spec/10 + 2``.

We re-design it TPU-first instead of wrapping a black box:

* **Framing by reshape, not gather** — the window (480 samples = 3 hops of 160)
  is an integer multiple of the hop, so the overlapping frame matrix is built
  from three shifted views of a ``[T+2, 160]`` reshape. No gathers, no
  dynamic shapes, fully fusible by XLA and trivially expressible in Pallas.
* **DFT as matmul** — a real DFT is two ``[480, n_bins]`` matrix multiplies
  that ride the MXU in bfloat16 with float32 accumulation, far cheaper than
  an HBM-bound FFT. Only the spectral bins the mel filterbank actually reads
  are computed: with fmax=3800 Hz that is bins 0..121 of 257, padded to one
  128-wide lane tile — a 3x cut in DFT FLOPs with an identical mel result
  (every dropped bin has zero filter weight).
* **Exact streaming == batch** — the frontend left-pads every clip with
  ``WINDOW - HOP = 320`` zero samples. Then every 1280-sample (80 ms) chunk
  contributes exactly 8 new frames, and a streaming implementation that
  carries a 320-sample tail sees the *identical* frame matrix as the batch
  path: outputs agree to float32 rounding (a few ulps of XLA matmul
  reassociation; bit-exact when the per-call frame counts match). The
  reference's streaming admittedly diverges from its batch path
  (`AudioFeatures.py:388-393`); here it is a tested invariant
  (tests/test_mel.py).

Output contract (matches the reference numerically in *shape and scale*):
    mel_frontend(x[n]) -> [n // HOP, N_MELS]   (for n a multiple of HOP)
    values = log10(mel_power + EPS) + LOG_OFFSET   (the ``x/10 + 2`` scale)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Frontend constants (the numeric contract; see SURVEY.md §2 "numeric contract")
# ---------------------------------------------------------------------------
SAMPLE_RATE = 16000
HOP = 160                   # 10 ms
WINDOW = 480                # 30 ms = 3 hops (framing-by-reshape invariant)
N_FFT = 512
N_MELS = 32
FMIN = 60.0
FMAX = 3800.0
CHUNK = 1280                # 80 ms streaming chunk
FRAMES_PER_CHUNK = CHUNK // HOP  # 8
LEFT_PAD = WINDOW - HOP     # 320 zero samples of left context
INT16_SCALE = 1.0 / 32768.0  # inputs arrive in int16 amplitude convention
MEL_EPS = 1e-8              # floor inside log10; log10(1e-8)+2 = -6, i.e.
                            # silence sits at the reference's -80 dB pad value
LOG_OFFSET = 2.0            # the reference's `spec/10 + 2` offset
PAD_VALUE = -6.0            # transformed-scale equivalent of the -80 dB pad
                            # used by the reference batch path (-80/10 + 2)


def _hann(n: int) -> np.ndarray:
    """Periodic Hann window."""
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)


@functools.lru_cache(maxsize=None)
def _dft_mel_matrices(dtype_name: str = "bfloat16"):
    """Precompute (cos, sin, mel_fb) as numpy constants.

    cos/sin: [WINDOW, n_keep] real-DFT basis with the Hann window folded in,
             pruned to the (lane-tile-aligned) bins the filterbank reads.
    mel_fb:  [n_keep, N_MELS] triangular filterbank (HTK mel).
    """
    n_bins = N_FFT // 2 + 1
    t = np.arange(WINDOW)[:, None]          # [480, 1]
    k = np.arange(n_bins)[None, :]          # [1, 257]
    ang = 2.0 * np.pi * t * k / N_FFT
    # Fold the Hann window AND the int16 normalisation into the DFT basis:
    # matmul inputs stay bit-identical between the batch and streaming paths
    # (an input-side scale would fuse differently per shape and break exact
    # streaming == batch equality).
    win = _hann(WINDOW)[:, None] * INT16_SCALE
    cos_m = (np.cos(ang) * win).astype(np.float64)
    sin_m = (-np.sin(ang) * win).astype(np.float64)

    # HTK mel filterbank
    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)

    mel_pts = np.linspace(hz_to_mel(FMIN), hz_to_mel(FMAX), N_MELS + 2)
    hz_pts = mel_to_hz(mel_pts)
    bin_freqs = np.arange(n_bins) * SAMPLE_RATE / N_FFT
    fb = np.zeros((n_bins, N_MELS))
    for m in range(N_MELS):
        lo, mid, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (bin_freqs - lo) / max(mid - lo, 1e-9)
        down = (hi - bin_freqs) / max(hi - mid, 1e-9)
        fb[:, m] = np.clip(np.minimum(up, down), 0.0, None)

    # Bin pruning: with FMAX=3800 Hz the filterbank's last nonzero row is
    # bin ~122 of 257 — compute ONLY the spectral bins the filterbank reads,
    # rounded up to a full 128-wide MXU lane tile. The mel output is the
    # same sum (every dropped row has zero filter weight); the DFT matmuls
    # shrink from three lane tiles (384 padded cols) to one.
    n_used = int(np.flatnonzero(fb.any(axis=1)).max()) + 1
    n_keep = min(n_bins, -(-n_used // 128) * 128)
    cos_m, sin_m, fb = cos_m[:, :n_keep], sin_m[:, :n_keep], fb[:n_keep]

    dt = np.dtype(np.float32) if dtype_name == "float32" else jnp.bfloat16
    return (
        np.asarray(cos_m, dtype=dt),
        np.asarray(sin_m, dtype=dt),
        np.asarray(fb, dtype=dt),
    )


def frame_signal(x: jnp.ndarray) -> jnp.ndarray:
    """Build the overlapping frame matrix with the reshape trick.

    Args:
        x: [..., n] float audio, n a multiple of HOP, ALREADY left-padded so
           that frame i covers samples [i*HOP, i*HOP + WINDOW).

    Returns:
        [..., n//HOP - 2, WINDOW] frame matrix.
    """
    n = x.shape[-1]
    if n % HOP != 0:
        raise ValueError(f"signal length {n} must be a multiple of HOP={HOP}")
    t = n // HOP
    r = x.reshape(x.shape[:-1] + (t, HOP))
    # frame i = concat(r[i], r[i+1], r[i+2]);  WINDOW == 3*HOP
    return jnp.concatenate([r[..., :-2, :], r[..., 1:-1, :], r[..., 2:, :]], axis=-1)


def log_mel_from_frames(frames: jnp.ndarray, *, compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """[..., T, WINDOW] frames -> [..., T, N_MELS] transformed log-mel."""
    cos_m, sin_m, fb = _dft_mel_matrices(
        "float32" if compute_dtype == jnp.float32 else "bfloat16"
    )
    f = frames.astype(compute_dtype)
    re = jnp.matmul(f, cos_m, preferred_element_type=jnp.float32)
    im = jnp.matmul(f, sin_m, preferred_element_type=jnp.float32)
    power = re * re + im * im
    mel = jnp.matmul(power.astype(compute_dtype), fb,
                     preferred_element_type=jnp.float32)
    # Transformed scale: dB/10 + 2  ==  log10(power + eps) + 2
    return jnp.log10(jnp.maximum(mel, 0.0) + MEL_EPS) + LOG_OFFSET


def mel_frontend_slab(x: jnp.ndarray, *,
                      compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Whole-clip log-mel via the hop-block decomposition, in plain XLA.

    Never materialises the [B, T, 480] frame matrix: since WINDOW == 3*HOP,
    ``frames @ W == sum_k rows[k:T+k] @ W_k`` over three row-shifted views of
    the [B, T+2, HOP] audio reshape and the matching [HOP, n_bins] slabs of
    the DFT basis. Output is numerically equivalent (bit-exact measured) to
    `mel_frontend`.

    Measured on v5e this is SLOWER than `mel_frontend` (643k vs 864k 1-s
    clips/s with the pruned basis; 438k vs 745k unpruned): XLA fuses the frame concat into the matmul operand read, so
    the frame matrix is never actually written to HBM, and one K=480 matmul
    utilises the MXU better than three K=160 ones. Kept as the portable
    fallback shape for kernels that cannot express the overlap (see
    ops/mel_pallas.py) and as documentation of the measurement.
    """
    x = x.astype(jnp.float32)
    if x.ndim == 1:
        x = x[None]
    n = x.shape[-1]
    if n % HOP != 0:
        x = jnp.pad(x, ((0, 0), (0, HOP - n % HOP)))
        n = x.shape[-1]
    t = n // HOP
    rows = jnp.pad(x, ((0, 0), (LEFT_PAD, 0))).reshape(x.shape[0], t + 2, HOP)
    rows = rows.astype(compute_dtype)

    cos_m, sin_m, fb = _dft_mel_matrices(
        "float32" if compute_dtype == jnp.float32 else "bfloat16")
    n_bins = np.asarray(cos_m).shape[-1]
    cos3 = np.asarray(cos_m).reshape(3, HOP, n_bins)
    sin3 = np.asarray(sin_m).reshape(3, HOP, n_bins)

    re = sum(jnp.matmul(rows[:, k:t + k], jnp.asarray(cos3[k]),
                        preferred_element_type=jnp.float32)
             for k in range(3))
    im = sum(jnp.matmul(rows[:, k:t + k], jnp.asarray(sin3[k]),
                        preferred_element_type=jnp.float32)
             for k in range(3))
    power = re * re + im * im
    mel = jnp.matmul(power.astype(compute_dtype), fb,
                     preferred_element_type=jnp.float32)
    return jnp.log10(jnp.maximum(mel, 0.0) + MEL_EPS) + LOG_OFFSET


def mel_frontend(x: jnp.ndarray, *, compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Whole-clip log-mel. [..., n] int16-scale audio -> [..., n//HOP, N_MELS].

    The clip is left-padded with LEFT_PAD zeros, making the output length
    exactly n // HOP and the result identical to the streaming path.
    """
    x = x.astype(jnp.float32)
    n = x.shape[-1]
    if n % HOP != 0:
        # right-pad with zeros to a hop multiple (static shapes only)
        pad = HOP - n % HOP
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    pad_widths = [(0, 0)] * (x.ndim - 1) + [(LEFT_PAD, 0)]
    x = jnp.pad(x, pad_widths)
    frames = frame_signal(x)
    return log_mel_from_frames(frames, compute_dtype=compute_dtype)


def mel_streaming_step(tail: jnp.ndarray, chunk: jnp.ndarray,
                       *, compute_dtype=jnp.bfloat16):
    """One streaming step: 1280 new samples -> 8 new mel frames.

    Args:
        tail:  [..., LEFT_PAD] the last 320 samples seen before `chunk`
               (zeros at stream start).
        chunk: [..., CHUNK] new audio samples (int16 scale, float).

    Returns:
        (new_tail [..., LEFT_PAD], frames [..., FRAMES_PER_CHUNK, N_MELS])

    Invariant (tested): concatenating the frames from successive steps equals
    `mel_frontend` of the concatenated audio, exactly.
    """
    chunk = chunk.astype(jnp.float32)
    tail = tail.astype(jnp.float32)
    buf = jnp.concatenate([tail, chunk], axis=-1)       # [..., 1600]
    frames = frame_signal(buf)                          # [..., 8, WINDOW]
    out = log_mel_from_frames(frames, compute_dtype=compute_dtype)
    new_tail = buf[..., -LEFT_PAD:]
    return new_tail, out


def n_mel_frames(n_samples: int) -> int:
    """Number of mel frames produced for an n_samples clip."""
    return (n_samples + HOP - 1) // HOP
