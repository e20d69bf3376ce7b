"""Real-recorded-audio sanity probes (gated on the reference checkout).

Everything else in the suite runs on synthetic audio. The reference ships
four real 16 kHz recordings with its examples (examples/training_data/:
a spoken wake word, a spoken negative, a noise bed, a measured RIR); when
that checkout is present, run the only REAL-audio assertions the
environment allows:

  * the VAD fires on the two speech recordings and stays low on the
    non-speech ones (the property a reference user's `vad_threshold=0.5`
    relies on, nano_interpreter.py VAD gate semantics), and
  * the bundled pretrained encoder is volume-invariant on real speech
    while separating different real utterances — i.e. the synthetic
    pretraining transfers to at least these real recordings.

Skipped wholesale when the reference tree is absent (the probes are about
the environment's data, not about our code shipping it).
"""

import os

import numpy as np
import pytest

_BASE = "/root/reference/examples/training_data"
_CLIPS = {
    "speech_pos": os.path.join(_BASE, "positive", "example_wakeWord.wav"),
    "speech_neg": os.path.join(_BASE, "negative", "jast_example.wav"),
    "noise": os.path.join(_BASE, "noise", "noise-free-sound-0003.wav"),
    "rir": os.path.join(_BASE, "rir", "Echo(rir)_Download_from_anywhere.wav"),
}

pytestmark = pytest.mark.skipif(
    not all(os.path.exists(p) for p in _CLIPS.values()),
    reason="reference example recordings not available")

_CHUNK = 1280  # the interpreter's 80 ms hop


def _load_all():
    from nanowakeword_tpu.utils.audio_io import load_audio
    clips = {k: load_audio(p) for k, p in _CLIPS.items()}
    assert all(v is not None for v in clips.values())
    return clips


def _vad_max(audio: np.ndarray) -> float:
    from nanowakeword_tpu.interpreter.vad import VAD
    vad = VAD()
    return max(vad.predict(audio[i:i + _CHUNK])
               for i in range(0, len(audio) - _CHUNK + 1, _CHUNK))


def test_vad_on_real_recordings():
    """Chunked exactly as listen() feeds it: speech peaks high, the noise
    bed stays below the default 0.5 gate, the RIR impulse near zero."""
    clips = _load_all()
    assert _vad_max(clips["speech_pos"]) > 0.9
    assert _vad_max(clips["speech_neg"]) > 0.9
    assert _vad_max(clips["noise"]) < 0.6
    assert _vad_max(clips["rir"]) < 0.2


def _pooled_unit_embeddings(batch: np.ndarray) -> np.ndarray:
    from nanowakeword_tpu.data.features import AudioFeatures
    emb = AudioFeatures().embed_clips(batch)          # [N, frames, 96]
    pooled = emb.mean(axis=1)
    return pooled / np.linalg.norm(pooled, axis=1, keepdims=True)


def test_encoder_transfers_to_real_speech():
    """The synthetic-pretrained encoder, applied to REAL speech: a volume
    change must barely move the embedding while a different utterance
    moves it far. Measured on the bundled assets: v3 self-sim 0.995 /
    cross-sim 0.56 (gap 0.43); v4 (the supcon-trained ladder winner)
    self-sim 0.946 / cross-sim 0.028 (gap 0.92) — v4 trades a sliver of
    volume invariance for far stronger utterance separation, which is the
    property the downstream classifier consumes. Bars guard the property
    with margin under both."""
    clips = _load_all()
    n = 16000

    def fixed(x):
        out = np.zeros(n, np.float32)
        m = min(len(x), n)
        out[:m] = x[:m]
        return out

    pooled = _pooled_unit_embeddings(np.stack([
        fixed(clips["speech_pos"]),
        fixed(clips["speech_pos"] * 0.7),   # same words, softer
        fixed(clips["speech_neg"]),         # different words/speaker
    ]))
    self_sim = float(pooled[0] @ pooled[1])
    cross_sim = float(pooled[0] @ pooled[2])
    assert self_sim > 0.9, f"volume invariance broken: {self_sim}"
    assert cross_sim < 0.7, f"utterances not separated: {cross_sim}"
    assert self_sim - cross_sim > 0.3
