"""Wake-word quality regression: the campaign-trained model must detect.

Guards the round-4 quality-parity campaign result (campaign/results.json,
built by tools/quality_campaign.py): a CRNN trained to convergence by THIS
framework's full pipeline (-G -t -T -d on the built-in synthesis channels)
detects "hey nano" on held-out synthetic speakers and rejects held-out
speech/noise streams. The committed artifact is streamed over a small
eval set regenerated deterministically here (same generators, disjoint
seeds from training AND from the big campaign eval), so the floor asserted
below breaks if a regression in the feature frontend, the interpreter, or
the artifact loader degrades real detection quality.

Bars are set with margin under the measured campaign numbers
(campaign/results.json) — not at them — so suite flakes don't track minor
synthesis noise.
"""

import os
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
ARTIFACT = REPO / "campaign" / "hey_nano_crnn.nww"
LITE = REPO / "campaign" / "hey_nano_crnn_lite.nww"

N_POS = 25
N_NEG_STREAMS = 8        # 10-s speech streams
THRESHOLD = 0.90
SR = 16000

pytestmark = pytest.mark.skipif(
    not ARTIFACT.exists(),
    reason="campaign artifact not built (run tools/quality_campaign.py)")


@pytest.fixture(scope="module")
def eval_clips():
    import sys
    sys.path.insert(0, str(REPO / "tools"))
    from quality_campaign import (_mic_floor, _positive_eval_clip,
                                  _speech_stream, _words)
    words = _words()
    rng = np.random.default_rng(55_000_000)
    pos = [_positive_eval_clip(rng, 55_000_000 + i) for i in range(N_POS)]
    negs = []
    srng = np.random.default_rng(56_000_000)
    for _ in range(N_NEG_STREAMS):
        negs.append(_speech_stream(srng, words, 10))
    noise = [_mic_floor(np.random.default_rng(57_000_000 + i), 10 * SR) * 30
             for i in range(3)]
    return pos, negs + noise


def _max_scores(artifact, clips):
    from nanowakeword_tpu.interpreter.nanointerpreter import NanoInterpreter
    interp = NanoInterpreter.load_model(str(artifact))
    key = list(interp.models.keys())[0]
    out = []
    for clip in clips:
        interp.reset()
        best = 0.0
        audio = np.clip(np.asarray(clip) * 32767.0,
                        -32768, 32767).astype(np.int16)
        for i in range(0, len(audio), 1280):
            chunk = audio[i:i + 1280]
            if len(chunk) < 1280:
                break
            best = max(best, interp.predict(chunk).get(key, 0.0))
        out.append(best)
    return np.asarray(out)


def test_trained_model_detects_held_out_speakers(eval_clips):
    pos, _ = eval_clips
    scores = _max_scores(ARTIFACT, pos)
    detected = int((scores >= THRESHOLD).sum())
    assert detected >= N_POS - 2, (
        f"miss rate too high: {N_POS - detected}/{N_POS} missed at "
        f"{THRESHOLD}; scores min {scores.min():.3f}")


def test_trained_model_rejects_speech_and_noise(eval_clips):
    _, negs = eval_clips
    scores = _max_scores(ARTIFACT, negs)
    alarms = int((scores > THRESHOLD).sum())
    assert alarms <= 1, (
        f"false alarms: {alarms}/{len(negs)} streams crossed {THRESHOLD}; "
        f"max {scores.max():.3f}")


def test_lite_gate_detects(eval_clips):
    if not LITE.exists():
        pytest.skip("lite campaign artifact not built")
    pos, _ = eval_clips
    scores = _max_scores(LITE, pos)
    # the 12K-param gate runs at a LOW threshold in the cascade
    # (gate_threshold 0.3): its job is recall, not precision
    detected = int((scores >= 0.3).sum())
    assert detected >= N_POS - 2, (
        f"gate misses: {N_POS - detected}/{N_POS} below 0.3")
