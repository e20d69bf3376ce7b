"""Mel frontend: shape contract, streaming==batch exactness, numeric sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nanowakeword_tpu.ops import mel as M


def _tone(n, freq=440.0, amp=8000.0, sr=16000):
    t = np.arange(n) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


class TestShapes:
    def test_one_second_clip(self):
        x = _tone(16000)
        out = M.mel_frontend(x)
        assert out.shape == (100, M.N_MELS)

    def test_batched(self):
        x = np.stack([_tone(32000, f) for f in (300, 500, 700)])
        out = M.mel_frontend(x)
        assert out.shape == (3, 200, M.N_MELS)

    def test_non_hop_multiple_pads(self):
        x = _tone(16000 + 37)
        out = M.mel_frontend(x)
        assert out.shape == (M.n_mel_frames(16000 + 37), M.N_MELS)

    def test_frames_per_chunk(self):
        assert M.CHUNK // M.HOP == M.FRAMES_PER_CHUNK == 8


class TestStreamingEquivalence:
    """The hard invariant the reference could not provide
    (AudioFeatures.py:388-393): streaming mel == whole-clip mel, exactly."""

    @pytest.mark.parametrize("n_chunks", [1, 3, 13])
    def test_streaming_matches_batch(self, rng, n_chunks):
        x = rng.integers(-20000, 20000, n_chunks * M.CHUNK).astype(np.float32)
        # jit both paths: that's how production runs them, and XLA's fused
        # log10 rounds differently from the op-by-op eager path (~5e-7).
        batch_out = np.asarray(jax.jit(
            lambda a: M.mel_frontend(a, compute_dtype=jnp.float32))(x))

        tail = jnp.zeros(M.LEFT_PAD)
        frames = []
        step = jax.jit(
            lambda t, c: M.mel_streaming_step(t, c, compute_dtype=jnp.float32)
        )
        for i in range(n_chunks):
            tail, f = step(tail, x[i * M.CHUNK:(i + 1) * M.CHUNK])
            frames.append(np.asarray(f))
        stream_out = np.concatenate(frames, axis=0)

        assert stream_out.shape == batch_out.shape
        # Same frames, same constants; residual is XLA matmul K-blocking
        # reassociation across shapes (a few float32 ulps).
        np.testing.assert_allclose(stream_out, batch_out, atol=1e-5)

    def test_streaming_matches_batch_bf16(self, rng):
        """Same invariant holds in the production bfloat16 compute path."""
        x = rng.integers(-20000, 20000, 5 * M.CHUNK).astype(np.float32)
        batch_out = np.asarray(jax.jit(M.mel_frontend)(x))
        tail = jnp.zeros(M.LEFT_PAD)
        step = jax.jit(M.mel_streaming_step)
        frames = []
        for i in range(5):
            tail, f = step(tail, x[i * M.CHUNK:(i + 1) * M.CHUNK])
            frames.append(np.asarray(f))
        np.testing.assert_allclose(np.concatenate(frames, 0), batch_out,
                                   atol=1e-5)


class TestNumerics:
    def test_tone_peaks_at_expected_mel_bin(self):
        """A 1 kHz tone must concentrate energy in the right mel band."""
        x = _tone(16000, freq=1000.0)
        out = np.asarray(M.mel_frontend(x, compute_dtype=jnp.float32))
        mid = out[20:80]  # steady-state frames
        peak_bin = int(np.argmax(mid.mean(axis=0)))
        # bin centres: mel-spaced 60..3800 over 32 bins; 1 kHz lands mid-scale
        fb = M._mel_filterbank()
        bin_freqs = np.arange(fb.shape[0]) * M.SAMPLE_RATE / M.N_FFT
        centre = float((fb[:, peak_bin] * bin_freqs).sum()
                       / fb[:, peak_bin].sum())
        assert abs(centre - 1000.0) < 150.0

    def test_hopdft_matches_direct_dft(self, rng):
        """The hop-DFT factorization (per-row dots + phase combine + 3-tap
        Hann) equals a direct windowed N_FFT-point DFT of each frame — the
        float64 oracle — to the fast path's rounding."""
        x = rng.integers(-20000, 20000, 16000).astype(np.float32)
        out = np.asarray(M.mel_frontend(x, compute_dtype=jnp.float32))
        ref = M.mel_frontend_reference(x)[0]
        np.testing.assert_allclose(out, ref, atol=2e-4)

    def test_hopdft_matches_fft_oracle(self, rng):
        """Fully independent oracle: np.fft.rfft over the windowed frames
        with an unpruned filterbank gives the same log-mel (the lane-tile
        bin pruning is lossless for fmax=3800)."""
        x = rng.integers(-20000, 20000, 16000).astype(np.float64)
        out = np.asarray(M.mel_frontend(x.astype(np.float32),
                                        compute_dtype=jnp.float32))
        n_bins = M.N_FFT // 2 + 1
        padded = np.concatenate([np.zeros(M.LEFT_PAD), x])
        t = len(x) // M.HOP
        frames = np.stack([padded[i * M.HOP:i * M.HOP + M.WINDOW]
                           for i in range(t)])
        win = (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(M.WINDOW)
                                  / M.WINDOW)) / 32768.0
        spec = np.fft.rfft(frames * win, n=M.N_FFT)[:, :n_bins]
        # full-spectrum filterbank, rebuilt without pruning
        def h2m(f):
            return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)
        def m2h(m):
            return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)
        pts = m2h(np.linspace(h2m(M.FMIN), h2m(M.FMAX), M.N_MELS + 2))
        freqs = np.arange(n_bins) * M.SAMPLE_RATE / M.N_FFT
        fb = np.zeros((n_bins, M.N_MELS))
        for m in range(M.N_MELS):
            lo, mid, hi = pts[m], pts[m + 1], pts[m + 2]
            fb[:, m] = np.clip(np.minimum((freqs - lo) / (mid - lo),
                                          (hi - freqs) / (hi - mid)), 0, None)
        ref = np.log10(np.abs(spec) ** 2 @ fb + M.MEL_EPS) + M.LOG_OFFSET
        np.testing.assert_allclose(out, ref, atol=2e-4)

    def test_silence_hits_floor(self):
        x = np.zeros(16000, np.float32)
        out = np.asarray(M.mel_frontend(x, compute_dtype=jnp.float32))
        np.testing.assert_allclose(out, np.log10(M.MEL_EPS) + M.LOG_OFFSET, atol=1e-5)

    def test_scale_matches_reference_transform(self):
        """Louder audio -> larger values on the x/10+2 transformed dB scale:
        10x amplitude = +20 dB = +2.0 on the transformed scale."""
        quiet = np.asarray(M.mel_frontend(_tone(16000, amp=300.0),
                                          compute_dtype=jnp.float32))
        loud = np.asarray(M.mel_frontend(_tone(16000, amp=3000.0),
                                         compute_dtype=jnp.float32))
        peak = int(np.argmax(loud[50]))
        assert loud[50, peak] - quiet[50, peak] == pytest.approx(2.0, abs=0.05)

    def test_bf16_close_to_f32(self, rng):
        x = rng.integers(-20000, 20000, 16000).astype(np.float32)
        a = np.asarray(M.mel_frontend(x, compute_dtype=jnp.float32))
        b = np.asarray(M.mel_frontend(x, compute_dtype=jnp.bfloat16))
        assert np.abs(a - b).mean() < 0.05
