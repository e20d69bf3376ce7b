"""Wake-word quality regression: the campaign-trained model must detect.

Guards the round-5 quality-parity campaign result (campaign/results.json,
built by tools/quality_campaign.py recipe v3 — union3 rendering for BOTH
classes, v4 encoder): a CRNN trained to convergence by THIS framework's
full pipeline (-G -t -T -d on the built-in synthesis channels) detects
"hey nano" on held-out synthetic speakers — raw threshold AND the swept
production operating point, including the never-trained fx transfer
chain — and rejects held-out speech/noise streams. The committed artifact is streamed over a small
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
N_FX = 15                # never-trained fx-chain transfer positives
THRESHOLD = 0.90         # raw per-frame threshold (reference evaluator)
OP_THRESHOLD = 0.85      # swept production operating point
OP_PATIENCE = 2          # (campaign/results.json operating_point_sweep)
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
    frng = np.random.default_rng(58_000_000)
    fx = [_positive_eval_clip(frng, 58_000_000 + i, channel="formant_fx")
          for i in range(N_FX)]
    return pos, negs + noise, fx


def _score_traces(artifact, clips):
    """Per-chunk score traces (the production post-filter needs runs, not
    just the max)."""
    from nanowakeword_tpu.interpreter.nanointerpreter import NanoInterpreter
    interp = NanoInterpreter.load_model(str(artifact))
    key = list(interp.models.keys())[0]
    out = []
    for clip in clips:
        interp.reset()
        audio = np.clip(np.asarray(clip) * 32767.0,
                        -32768, 32767).astype(np.int16)
        row = []
        for i in range(0, len(audio), 1280):
            chunk = audio[i:i + 1280]
            if len(chunk) < 1280:
                break
            row.append(interp.predict(chunk).get(key, 0.0))
        out.append(np.asarray(row, np.float32))
    return out


def _max_scores(artifact, clips):
    return np.asarray([t.max() if t.size else 0.0
                       for t in _score_traces(artifact, clips)])


def _production_detect(traces, threshold=OP_THRESHOLD, patience=OP_PATIENCE):
    """Detection under the swept production operating point: `patience`
    CONSECUTIVE chunk scores >= threshold (campaign/results.json
    operating_point_sweep)."""
    hits = []
    for t in traces:
        h = t >= threshold
        run = False
        for k in range(len(h) - patience + 1):
            if h[k:k + patience].all():
                run = True
                break
        hits.append(run)
    return np.asarray(hits)


def test_trained_model_detects_held_out_speakers(eval_clips):
    pos, _, _ = eval_clips
    scores = _max_scores(ARTIFACT, pos)
    detected = int((scores >= THRESHOLD).sum())
    assert detected >= N_POS - 2, (
        f"miss rate too high: {N_POS - detected}/{N_POS} missed at "
        f"{THRESHOLD}; scores min {scores.min():.3f}")


def test_trained_model_rejects_speech_and_noise(eval_clips):
    _, negs, _ = eval_clips
    scores = _max_scores(ARTIFACT, negs)
    alarms = int((scores > THRESHOLD).sum())
    assert alarms <= 1, (
        f"false alarms: {alarms}/{len(negs)} streams crossed {THRESHOLD}; "
        f"max {scores.max():.3f}")


def test_lite_gate_detects(eval_clips):
    if not LITE.exists():
        pytest.skip("lite campaign artifact not built")
    pos, _, _ = eval_clips
    scores = _max_scores(LITE, pos)
    # the 12K-param gate runs at a LOW threshold in the cascade
    # (gate_threshold 0.3): its job is recall, not precision
    detected = int((scores >= 0.3).sum())
    assert detected >= N_POS - 2, (
        f"gate misses: {N_POS - detected}/{N_POS} below 0.3")


def test_production_operating_point(eval_clips):
    """Patience-filtered guards at the SWEPT production operating point
    (VERDICT r4 weak #5): the headline "0 FA over 3 h at the production
    settings" and the positive miss there need tripwires, not just the
    raw-threshold bars above. Measured (campaign/results.json): 2.5%
    in-domain production miss, 0 patience alarms over 3 h of
    speech+noise."""
    pos, negs, _ = eval_clips
    pos_hit = _production_detect(_score_traces(ARTIFACT, pos))
    assert pos_hit.sum() >= N_POS - 3, (
        f"production-point misses: {N_POS - int(pos_hit.sum())}/{N_POS} at "
        f"threshold {OP_THRESHOLD} patience {OP_PATIENCE}")
    neg_hit = _production_detect(_score_traces(ARTIFACT, negs))
    assert neg_hit.sum() <= 1, (
        f"production-point false alarms: {int(neg_hit.sum())}/{len(negs)} "
        f"streams")


def test_transfer_fx_channel(eval_clips):
    """The honest transfer eval: held-out-speaker positives through the
    telephone-EQ/reverb/clip fx chain NOTHING in the product trains on.
    Measured 0.0% raw / 2.67% production miss (campaign/results.json);
    bars carry flake margin."""
    _, _, fx = eval_clips
    traces = _score_traces(ARTIFACT, fx)
    raw = sum(t.max() >= THRESHOLD for t in traces)
    assert raw >= N_FX - 2, (
        f"fx-transfer raw misses: {N_FX - raw}/{N_FX} at {THRESHOLD}")
    prod = _production_detect(traces)
    assert prod.sum() >= N_FX - 3, (
        f"fx-transfer production misses: {N_FX - int(prod.sum())}/{N_FX}")


def test_cascade_as_deployed(eval_clips):
    """Composed gate+verifier floor, exactly as load_model(cascade=True)
    deploys it (VERDICT r4 missing #2): the <stem>_lite gate scores every
    chunk and the verifier only counts where the gate cleared. Measured
    (campaign/results.json cascade): composed in-domain production miss
    6.0%, 0 FA on speech/noise, verifier skip-rate 89.4% on negative
    streams."""
    if not LITE.exists():
        pytest.skip("lite campaign artifact not built")
    from nanowakeword_tpu.interpreter.nanointerpreter import NanoInterpreter
    pos, negs, _ = eval_clips
    interp = NanoInterpreter.load_model(str(ARTIFACT), cascade=True)
    assert interp.is_cascade, "auto-discovery of the _lite gate failed"
    verifier = interp.cascade_config["verifier"]
    gate = interp.cascade_config["gate"]
    gate_thr = interp.cascade_config["gate_threshold"]

    def run(clips):
        v_traces, invoked, chunks = [], 0, 0
        for clip in clips:
            interp.reset()
            audio = np.clip(np.asarray(clip) * 32767.0,
                            -32768, 32767).astype(np.int16)
            row = []
            for i in range(0, len(audio) - 1279, 1280):
                res = interp.predict(audio[i:i + 1280])
                row.append(res.get(verifier, 0.0))
                invoked += res.get(gate, 0.0) >= gate_thr
                chunks += 1
            v_traces.append(np.asarray(row, np.float32))
        return v_traces, invoked / max(chunks, 1)

    pos_traces, _ = run(pos)
    hits = _production_detect(pos_traces)
    assert hits.sum() >= N_POS - 4, (
        f"cascade production misses: {N_POS - int(hits.sum())}/{N_POS}")

    neg_traces, neg_invoke_rate = run(negs)
    alarms = _production_detect(neg_traces)
    assert alarms.sum() <= 1, (
        f"cascade false alarms: {int(alarms.sum())}/{len(negs)} streams")
    # the cascade's reason to exist: the verifier must be SKIPPED on the
    # overwhelming majority of negative audio (measured skip 89.4%)
    assert neg_invoke_rate <= 0.5, (
        f"verifier invoked on {neg_invoke_rate:.0%} of negative chunks")

def test_committed_evidence_is_consistent():
    """The committed tuning record (campaign/sweep.json: full patience x
    threshold grid + stress ROC) must agree with the published winner in
    campaign/results.json and with the constants this suite guards at —
    catches evidence/claim drift if either file is regenerated alone."""
    import json

    sweep = json.loads((REPO / "campaign" / "sweep.json").read_text())
    results = json.loads((REPO / "campaign" / "results.json").read_text())
    published = results["operating_point_sweep"]["operating_point"]

    assert sweep["operating_point"] == published
    assert published["threshold"] == OP_THRESHOLD
    assert published["patience"] == OP_PATIENCE
    # the winner must actually be a row of the recorded grid
    match = [r for r in sweep["grid"]
             if r["threshold"] == published["threshold"]
             and r["patience"] == published["patience"]]
    assert len(match) == 1 and match[0] == published
    # and satisfy the selection rule's hard constraint
    assert published["negative_speech_fa_per_h"] == 0.0
    assert published["noise_fa_per_h"] == 0.0
