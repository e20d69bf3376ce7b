"""Quality-parity campaign: prove a model trained by THIS framework detects
wake words at the reference's claimed quality.

The reference quantifies its value proposition only as quality anecdotes
(`/root/reference/README.md:325-333`): stable loss 0.0086, avg pos/neg
logits +5.447/-5.721, and <1 false positive per 16-28 h of audio. This
campaign reproduces the full product path on the built-in synthesis
channels and publishes the same four numbers, measured:

  1. `prep`     — synthesize noise/RIR pools and HELD-OUT eval sets
                  (disjoint speaker seeds; positives placed mid-stream in
                  3-s clips; negatives as 30-s speech/noise streams), and
                  write the campaign YAML config.
  2. `pipeline` — run the real CLI pipeline end-to-end: `-G` (fixed-phrase
                  positives + phoneme/word-adversarial + generic-speech
                  negatives), `-t` (device augmentation + feature mmaps),
                  `-T` (CRNN to convergence on the ISBL sampler, with
                  validation), `-d` (distilled lite gate).
  3. `evaluate` — stream every eval set through the repo's own
                  `test_model/evaluate_model_with_audio.py` semantics
                  (per-file max score at threshold 0.90) on the CPU
                  backend (edge-device conditions), for BOTH the full
                  model and the distilled gate.
  4. `sweep`    — grid patience x threshold over the recorded traces and
                  pick the production operating point (round 5).
  5. `cascade`  — evaluate gate+verifier composed, as `load_model(...,
                  cascade=True)` deploys it, incl. verifier-invocation
                  rate (round 5).
  6. `report`   — write campaign/results.json + copy artifacts into
                  campaign/ for the regression test.

Round-5 recipe changes (VERDICT r4): the pretrained encoder is the
ladder-winning v4 asset; positives synthesize through ALL THREE rendering
families (union3 — a union-of-two run this round still missed 49% of the
third channel at patience), so the honest transfer eval becomes the
never-trained telephone-EQ/reverb/clip fx chain (positive_fx set) plus
held-out speakers everywhere; a min_distance=0.2 hard phoneme-adversarial
pool joins training against the 74 FA/h stress-set result; the noise pool
doubles (4 augmentation rounds) with a bigger composition quota and noise
joins VALIDATION, after the first round-5 run's trained model
false-alarmed on babble/white-noise streams that best-checkpoint
selection never saw.

NEGATIVES render union3 too (recipe v3). Measured shortcut, second
round-5 run: with union3 positives but formant-only negatives, the
rendering family itself predicts the label (all 9.5k negative clips were
formant; 2/3 of positives were not) — the trained model missed 77% of
in-domain FORMANT positives (median max score 0.688) while detecting 90%
resonator / 98% harmonic and rejecting every negative stream at max score
0.014. A wake-word model that keys on the synthesizer, not the phrase, is
useless on real voices; with negatives drawn from the same three-channel
mixture the channel carries zero label information and the model must
discriminate on phonetic content.

Run everything:  python tools/quality_campaign.py all
Stages are resumable; data lives under /tmp/nww_campaign (regenerated
deterministically from seeds — nothing precious off-repo).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

WORK = Path(os.environ.get("NWW_CAMPAIGN_DIR", "/tmp/nww_campaign"))
DATA = WORK / "data"
EVAL = WORK / "eval"
TRAINED = WORK / "trained"
CONFIG_PATH = WORK / "config_hey_nano.yaml"
RESULTS_DIR = REPO / "campaign"

PHRASE = "hey nano"
MODEL_NAME = "hey_nano_crnn"
SR = 16000
THRESHOLD = 0.90
# Production operating point: the interpreter's patience post-filter
# (predict(patience={key: N})) requires N consecutive 80-ms frames >=
# threshold before a detection fires. Raw per-frame max (patience 1) is
# the reference evaluator's semantics; deployments use patience to kill
# single-frame spikes. Both are reported.
PATIENCE = 3

# Speaker-seed bases. A "speaker" is a (seed, f0) draw inside
# generate_samples / formant_synthesize; disjoint bases give disjoint
# speakers. Train/val use the -G stage (bases 10 / 20_000 via tts_settings);
# eval sets below use >= 1_000_000.
SEED_EVAL_POS = 1_000_000
SEED_EVAL_POS_RESON = 1_500_000
SEED_EVAL_POS_HARM = 1_750_000
SEED_EVAL_POS_FX = 1_250_000
SEED_EVAL_SPEECH = 2_000_000
SEED_EVAL_ADV = 2_500_000
SEED_EVAL_NOISE = 3_000_000
SEED_TRAIN_NOISE = 4_000_000
SEED_RIR = 5_000_000

N_EVAL_POS = 400            # held-out formant speakers
N_EVAL_POS_RESON = 150      # resonator channel, held-out speakers (round 5:
                            # positives TRAIN on the union3 of all three
                            # rendering families)
N_EVAL_POS_HARM = 150       # harmonic channel, held-out speakers
N_EVAL_POS_FX = 150         # the HONEST transfer eval: held-out-speaker
                            # formant positives through the telephone-EQ/
                            # reverb/clip fx chain (tts.apply_channel_fx) —
                            # a processing domain NOTHING in the product
                            # ever trains on (the encoder ladder's held-out
                            # domain, pretrain_encoder.py)
EVAL_SPEECH_FILES = 240     # 30-s generic-speech streams = 2.0 h
EVAL_ADV_FILES = 60         # 30-s adversarial-speech streams = 0.5 h
EVAL_NOISE_FILES = 120      # 30-s noise streams = 1.0 h
STREAM_SECONDS = 30
N_TRAIN_NOISE = 600         # 10-s background clips for augmentation mixing
N_RIR = 300


def _write_wav(path, audio_f32):
    from nanowakeword_tpu.utils.audio_io import write_wav
    write_wav(str(path), np.asarray(audio_f32, np.float32) * 32767.0)


def _dictionary_phrase(rng, words, n_words):
    return " ".join(words[rng.integers(len(words))] for _ in range(n_words))


def _pink_noise(rng, n):
    """1/f-ish noise via shaped rfft of white noise."""
    spec = np.fft.rfft(rng.standard_normal(n))
    freqs = np.maximum(np.fft.rfftfreq(n, 1 / SR), 1.0)
    out = np.fft.irfft(spec / np.sqrt(freqs), n)
    return out / (np.abs(out).max() + 1e-9)


def _babble(rng, words, n, n_voices=4):
    """Overlapping formant speech at low level — crowd babble."""
    from nanowakeword_tpu.data.generator.tts import formant_synthesize
    out = np.zeros(n, np.float32)
    for v in range(n_voices):
        pos = 0
        while pos < n:
            seed = int(rng.integers(2**31))
            a = formant_synthesize(
                _dictionary_phrase(rng, words, int(rng.integers(2, 5))),
                seed=seed, f0=float(rng.uniform(90, 220)))
            end = min(pos + len(a), n)
            out[pos:end] += a[:end - pos] * 0.5
            pos += len(a) + int(rng.uniform(0, 0.5) * SR)
    peak = np.abs(out).max()
    return out / (peak + 1e-9)


def _mic_floor(rng, n):
    """Microphone-style noise floor for synthetic eval audio: real capture
    chains never emit exact digital zeros, and the training distribution's
    background RMS is floored at MIN_BG_RMS=0.005 (reference parity,
    augment_clips.py:62). Digital-silence gaps are out-of-distribution for
    ANY model trained on this pipeline — round-4 measurement: a converged
    model scores ~1.0 on 'phrase then exact zeros' windows — so eval
    streams carry a floor drawn around the trained-in minimum."""
    floor_rms = rng.uniform(0.003, 0.02)
    return _pink_noise(rng, n).astype(np.float32) * floor_rms * 3.0


def _speech_stream(rng, words, seconds, synth_fn=None):
    """Concatenate random phrases into one `seconds`-long stream."""
    from nanowakeword_tpu.data.generator.tts import (cleanup_filter,
                                                     formant_synthesize)
    synth = synth_fn or formant_synthesize
    n = seconds * SR
    out = _mic_floor(rng, n)
    pos = int(rng.uniform(0, 0.4) * SR)
    while pos < n - SR // 2:
        seed = int(rng.integers(2**31))
        a = synth(_dictionary_phrase(rng, words, int(rng.integers(1, 5))),
                  seed=seed, f0=float(rng.uniform(90, 220)))
        a = cleanup_filter(a)
        end = min(pos + len(a), n)
        out[pos:end] += a[:end - pos]
        pos = end + int(rng.uniform(0.1, 0.6) * SR)
    return out


def _positive_eval_clip(rng, seed, channel="formant"):
    """3-s clip with the wake phrase placed mid-stream (past interpreter
    warm-up), faint noise floor so the stream is not digital silence."""
    from nanowakeword_tpu.data.generator.tts import (apply_channel_fx,
                                                     cleanup_filter,
                                                     formant_synthesize,
                                                     harmonic_synthesize,
                                                     resonator_synthesize)
    if channel == "resonator":
        a = resonator_synthesize(PHRASE, seed=seed,
                                 f0=float(rng.uniform(140, 240)),
                                 vtl_scale=float(rng.uniform(0.9, 1.1)))
    elif channel == "harmonic":
        a = harmonic_synthesize(PHRASE, seed=seed,
                                f0=float(rng.uniform(120, 240)),
                                vtl_scale=float(rng.uniform(0.9, 1.1)))
    else:
        a = formant_synthesize(PHRASE, seed=seed,
                               f0=float(rng.uniform(90, 220)))
        if channel == "formant_fx":
            a = apply_channel_fx(a, np.random.default_rng(seed * 6007 + 1))
    a = cleanup_filter(a)
    n = 3 * SR
    out = _mic_floor(rng, n)
    offset = int(rng.uniform(0.9, max(0.91, 3.0 - len(a) / SR - 0.1)) * SR)
    end = min(offset + len(a), n)
    out[offset:end] += a[:end - offset]
    return out


def _adv_texts(n, seed):
    """Fresh phoneme-adversarial draws (disjoint from the -G stage's)."""
    import random as pyrandom

    from nanowakeword_tpu.data.generator.adversarial_texts import (
        PhonemeAdversarialGenerator, get_phonemizer_model)
    from nanowakeword_tpu.data.generator.g2p import collapse_repeated_letters
    state = pyrandom.getstate()
    np_state = np.random.get_state()
    try:
        pyrandom.seed(seed)
        np.random.seed(seed % (2**31))
        gen = PhonemeAdversarialGenerator(get_phonemizer_model(),
                                          min_distance=0.35)
        return [collapse_repeated_letters(v)
                for v in gen.generate(PHRASE, n)]
    finally:
        pyrandom.setstate(state)
        np.random.set_state(np_state)


_EXTRA_WORDS = [
    "table", "doctor", "purple", "sunday", "monday", "kitchen", "jacket",
    "pillow", "rocket", "silver", "candle", "butter", "finger", "market",
    "pencil", "ticket", "travel", "velvet", "walnut", "basket", "bottle",
    "camera", "danger", "engine", "forest", "guitar", "hammer", "island",
    "jungle", "ladder", "magnet", "napkin", "orange", "planet", "rabbit",
    "saddle", "tunnel", "valley", "wagon", "zebra", "anchor", "bridge",
    "castle", "desert", "eleven", "frozen", "galaxy", "helmet", "insect",
    "timber", "meadow", "nickel", "oyster", "puzzle", "quarter", "ribbon",
    "shadow", "temple", "umbrella", "violin", "whisper", "yogurt",
]


def _words():
    from nanowakeword_tpu.data.generator.adversarial_texts import (
        _FILLER_WORDS)
    return list(_FILLER_WORDS) + _EXTRA_WORDS


# --------------------------------------------------------------------------
# prep
# --------------------------------------------------------------------------

def stage_prep(force=False):
    t0 = time.time()
    words = _words()

    jobs = []

    noise_dir = DATA / "noise_train"
    if force or not noise_dir.is_dir():
        noise_dir.mkdir(parents=True, exist_ok=True)
        rng = np.random.default_rng(SEED_TRAIN_NOISE)
        for i in range(N_TRAIN_NOISE):
            kind = i % 3
            n = 10 * SR
            if kind == 0:
                a = _pink_noise(rng, n)
            elif kind == 1:
                a = rng.standard_normal(n)
                a = a / np.abs(a).max()
            else:
                a = _babble(rng, words, n)
            _write_wav(noise_dir / f"noise_{i:05d}.wav",
                       a * rng.uniform(0.05, 0.5))
        jobs.append(f"noise_train: {N_TRAIN_NOISE} x 10 s")

    rir_dir = DATA / "rir"
    if force or not rir_dir.is_dir():
        rir_dir.mkdir(parents=True, exist_ok=True)
        rng = np.random.default_rng(SEED_RIR)
        for i in range(N_RIR):
            rt = rng.uniform(0.08, 0.5)
            n = 4000
            rir = rng.standard_normal(n) * np.exp(-3.0 * np.arange(n)
                                                  / SR / rt)
            rir[0] = rng.uniform(1.5, 4.0)
            _write_wav(rir_dir / f"rir_{i:04d}.wav",
                       rir / np.abs(rir).max() * 0.9)
        jobs.append(f"rir: {N_RIR}")

    pos_dir = EVAL / "positive"
    if force or not pos_dir.is_dir():
        pos_dir.mkdir(parents=True, exist_ok=True)
        rng = np.random.default_rng(SEED_EVAL_POS)
        for i in range(N_EVAL_POS):
            _write_wav(pos_dir / f"pos_{i:05d}.wav",
                       _positive_eval_clip(rng, SEED_EVAL_POS + i))
        jobs.append(f"eval/positive: {N_EVAL_POS} held-out speakers")

    posr_dir = EVAL / "positive_resonator"
    if force or not posr_dir.is_dir():
        posr_dir.mkdir(parents=True, exist_ok=True)
        rng = np.random.default_rng(SEED_EVAL_POS_RESON)
        for i in range(N_EVAL_POS_RESON):
            _write_wav(posr_dir / f"posr_{i:05d}.wav",
                       _positive_eval_clip(rng, SEED_EVAL_POS_RESON + i,
                                           channel="resonator"))
        jobs.append(f"eval/positive_resonator: {N_EVAL_POS_RESON}")

    posh_dir = EVAL / "positive_harmonic"
    if force or not posh_dir.is_dir():
        posh_dir.mkdir(parents=True, exist_ok=True)
        rng = np.random.default_rng(SEED_EVAL_POS_HARM)
        for i in range(N_EVAL_POS_HARM):
            _write_wav(posh_dir / f"posh_{i:05d}.wav",
                       _positive_eval_clip(rng, SEED_EVAL_POS_HARM + i,
                                           channel="harmonic"))
        jobs.append(f"eval/positive_harmonic: {N_EVAL_POS_HARM}")

    posfx_dir = EVAL / "positive_fx"
    if force or not posfx_dir.is_dir():
        posfx_dir.mkdir(parents=True, exist_ok=True)
        rng = np.random.default_rng(SEED_EVAL_POS_FX)
        for i in range(N_EVAL_POS_FX):
            _write_wav(posfx_dir / f"posfx_{i:05d}.wav",
                       _positive_eval_clip(rng, SEED_EVAL_POS_FX + i,
                                           channel="formant_fx"))
        jobs.append(f"eval/positive_fx: {N_EVAL_POS_FX}")

    speech_dir = EVAL / "negative_speech"
    if force or not speech_dir.is_dir():
        speech_dir.mkdir(parents=True, exist_ok=True)
        rng = np.random.default_rng(SEED_EVAL_SPEECH)
        for i in range(EVAL_SPEECH_FILES):
            _write_wav(speech_dir / f"neg_{i:05d}.wav",
                       _speech_stream(rng, words, STREAM_SECONDS))
        jobs.append(f"eval/negative_speech: {EVAL_SPEECH_FILES} x "
                    f"{STREAM_SECONDS} s")

    adv_dir = EVAL / "negative_adversarial"
    if force or not adv_dir.is_dir():
        adv_dir.mkdir(parents=True, exist_ok=True)
        texts = _adv_texts(300, SEED_EVAL_ADV)
        rng = np.random.default_rng(SEED_EVAL_ADV)
        from nanowakeword_tpu.data.generator.tts import (cleanup_filter,
                                                         formant_synthesize)
        for i in range(EVAL_ADV_FILES):
            n = STREAM_SECONDS * SR
            out = _mic_floor(rng, n)
            pos = int(rng.uniform(0, 0.4) * SR)
            while pos < n - SR // 2:
                txt = texts[int(rng.integers(len(texts)))]
                a = cleanup_filter(formant_synthesize(
                    txt, seed=int(rng.integers(2**31)),
                    f0=float(rng.uniform(90, 220))))
                end = min(pos + len(a), n)
                out[pos:end] += a[:end - pos]
                pos = end + int(rng.uniform(0.15, 0.7) * SR)
            _write_wav(adv_dir / f"adv_{i:05d}.wav", out)
        jobs.append(f"eval/negative_adversarial: {EVAL_ADV_FILES} x "
                    f"{STREAM_SECONDS} s")

    noise_eval_dir = EVAL / "noise"
    if force or not noise_eval_dir.is_dir():
        noise_eval_dir.mkdir(parents=True, exist_ok=True)
        rng = np.random.default_rng(SEED_EVAL_NOISE)
        for i in range(EVAL_NOISE_FILES):
            n = STREAM_SECONDS * SR
            kind = i % 3
            if kind == 0:
                a = _pink_noise(rng, n)
            elif kind == 1:
                a = rng.standard_normal(n)
                a = a / np.abs(a).max()
            else:
                a = _babble(rng, words, n)
            _write_wav(noise_eval_dir / f"noise_{i:05d}.wav",
                       a * rng.uniform(0.05, 0.5))
        jobs.append(f"eval/noise: {EVAL_NOISE_FILES} x {STREAM_SECONDS} s")

    write_config()
    print(f"[prep] done in {time.time() - t0:.0f}s: "
          + ("; ".join(jobs) if jobs else "everything cached"))


def _generic_phrases(n, seed, min_words=1, max_words=5):
    """Random dictionary-word phrases — generic speech with no relation to
    the wake phrase (train negatives; the eval streams draw from the same
    distribution with disjoint seeds). Longer word counts give DENSE
    back-to-back speech clips: round-4 finding — a model trained only on
    short single-phrase negatives false-alarms on continuous speech
    streams, because 16-frame windows full of dense speech are outside its
    negative training distribution."""
    rng = np.random.default_rng(seed)
    words = _words()
    return [_dictionary_phrase(rng, words,
                               int(rng.integers(min_words, max_words)))
            for _ in range(n)]


def write_config():
    import yaml
    features = str(TRAINED / MODEL_NAME / "features")
    cfg = {
        "model_name": MODEL_NAME,
        "output_dir": str(TRAINED),
        "target_phrase": PHRASE,
        "background_paths": [str(DATA / "noise_train")],
        "rir_paths": [str(DATA / "rir")],
        "model_type": "crnn",
        "layer_size": 64,
        "n_blocks": 2,
        "embedding_dim": 96,
        "crnn_cnn_channels": [16, 32, 32],
        "crnn_rnn_type": "gru",
        "dropout_prob": 0.3,
        "activation_function": "relu",
        "steps": 20000,
        "stabilization_steps": 1000,
        # no early stopping: the 1000-sample val error saturates by ~3k
        # steps (round-4 v2 run stopped at 5500 with avg pos logit 0.81 —
        # underfit positives, median held-out max-score 0.989); the best
        # checkpoint should be selected over the FULL budget
        "early_stopping_patience": 0,
        "val_early_stopping_patience": 1000000,
        "optimizer_type": "adamw",
        "learning_rate_max": 0.0015,
        "lr_scheduler_type": "onecycle",
        "weight_decay": 0.01,
        "augmentation_batch_size": 512,
        "clip_length_samples": 32000,
        "device_cache": {"enabled": True},
        "augmentation_settings": {
            "min_snr_in_db": 5.0, "max_snr_in_db": 30.0,
            "pitch_prob": 0.5, "gain_prob": 1.0, "rir_prob": 0.5,
        },
        "data_generation_tasks": [
            # positives render through ALL THREE rendering families
            # (VERDICT r4 missing #3: formant-only positives missed 64% of
            # resonator positives at the production operating point; a
            # union-of-two run this round still missed 49% on the third).
            # The honest transfer domain is the never-trained fx chain
            # (positive_fx eval set) + held-out speakers everywhere.
            {"name": "positives", "enabled": True,
             "output_dir": str(DATA / "positive_train"),
             "num_samples": 3000,
             "text_source": {"type": "fixed_phrase", "phrase": PHRASE},
             "tts_settings": {"seed": 10, "channel": "union3"}},
            {"name": "positives_val", "enabled": True,
             "output_dir": str(DATA / "positive_val"),
             "num_samples": 300,
             "text_source": {"type": "fixed_phrase", "phrase": PHRASE},
             "tts_settings": {"seed": 20000, "channel": "union3"}},
            {"name": "phoneme_adversarial", "enabled": True,
             "output_dir": str(DATA / "neg_phoneme_adv"),
             "num_samples": 2000,
             "text_source": {"type": "phoneme_adversarial",
                             "base_phrase": PHRASE, "min_distance": 0.35},
             "tts_settings": {"seed": 30, "channel": "union3"}},
            # closer near-homophones (min_distance 0.2 vs the eval set's
            # 0.35): the adversarial stress set read 74 FA/h at patience 3
            # in round 4 — training on HARDER variants attacks it
            # (VERDICT r4 weak #3)
            {"name": "phoneme_adversarial_hard", "enabled": True,
             "output_dir": str(DATA / "neg_phoneme_adv_hard"),
             "num_samples": 1500,
             "text_source": {"type": "phoneme_adversarial",
                             "base_phrase": PHRASE, "min_distance": 0.2},
             "tts_settings": {"seed": 35, "channel": "union3"}},
            {"name": "word_adversarial", "enabled": True,
             "output_dir": str(DATA / "neg_word_adv"),
             "num_samples": 1500,
             "text_source": {"type": "auto_adversarial",
                             "base_phrase": PHRASE},
             "tts_settings": {"seed": 40, "channel": "union3"}},
            {"name": "generic_speech", "enabled": True,
             "output_dir": str(DATA / "neg_generic"),
             "num_samples": 2000,
             "text_source": {"type": "from_list",
                             "phrases": _generic_phrases(500, seed=50)},
             "tts_settings": {"seed": 50, "channel": "union3"}},
            {"name": "dense_speech", "enabled": True,
             "output_dir": str(DATA / "neg_dense"),
             "num_samples": 2500,
             "text_source": {"type": "from_list",
                             "phrases": _generic_phrases(
                                 600, seed=55, min_words=4, max_words=10)},
             "tts_settings": {"seed": 55, "channel": "union3"}},
            {"name": "negatives_val", "enabled": True,
             "output_dir": str(DATA / "negative_val"),
             "num_samples": 400,
             "file_prefix": "pa",
             "text_source": {"type": "phoneme_adversarial",
                             "base_phrase": PHRASE, "min_distance": 0.35},
             "tts_settings": {"seed": 60000, "channel": "union3"}},
            {"name": "negatives_val_dense", "enabled": True,
             "output_dir": str(DATA / "negative_val"),
             "num_samples": 300,
             "file_prefix": "dn",
             "text_source": {"type": "from_list",
                             "phrases": _generic_phrases(
                                 150, seed=70000, min_words=4,
                                 max_words=10)},
             "tts_settings": {"seed": 70000, "channel": "union3"}},
        ],
        "feature_generation_manifest": {
            "positive_features": {
                "input_audio_dirs": [str(DATA / "positive_train")],
                "output_filename": "positive_features.npy",
                "use_background_noise": True, "use_rir": True,
                "augmentation_rounds": 8},
            "phoneme_adv_features": {
                "input_audio_dirs": [str(DATA / "neg_phoneme_adv")],
                "output_filename": "phoneme_adv_features.npy",
                "use_background_noise": True, "use_rir": True,
                "augmentation_rounds": 4},
            "phoneme_adv_hard_features": {
                "input_audio_dirs": [str(DATA / "neg_phoneme_adv_hard")],
                "output_filename": "phoneme_adv_hard_features.npy",
                "use_background_noise": True, "use_rir": True,
                "augmentation_rounds": 4},
            "word_adv_features": {
                "input_audio_dirs": [str(DATA / "neg_word_adv")],
                "output_filename": "word_adv_features.npy",
                "use_background_noise": True, "use_rir": True,
                "augmentation_rounds": 4},
            "generic_features": {
                "input_audio_dirs": [str(DATA / "neg_generic")],
                "output_filename": "generic_features.npy",
                "use_background_noise": True, "use_rir": True,
                "augmentation_rounds": 4},
            "dense_features": {
                "input_audio_dirs": [str(DATA / "neg_dense")],
                "output_filename": "dense_features.npy",
                "use_background_noise": True, "use_rir": True,
                "augmentation_rounds": 4},
            # round-5 fix: at 2 rounds the noise pool (1200 rows) was the
            # smallest by far and the trained model false-alarmed on
            # babble/white-noise streams (52/h raw); 4 rounds + a bigger
            # composition quota restores the pure-noise decision boundary
            "noise_features": {
                "input_audio_dirs": [str(DATA / "noise_train")],
                "output_filename": "noise_features.npy",
                "use_background_noise": True,
                "augmentation_rounds": 4},
            "positive_val_features": {
                "input_audio_dirs": [str(DATA / "positive_val")],
                "output_filename": "positive_val_features.npy",
                "use_background_noise": True,
                "augmentation_rounds": 1},
            "negative_val_features": {
                "input_audio_dirs": [str(DATA / "negative_val")],
                "output_filename": "negative_val_features.npy",
                "use_background_noise": True,
                "augmentation_rounds": 1},
            # noise in VALIDATION too: best-checkpoint selection that never
            # sees noise can pick a checkpoint that false-alarms on it
            "noise_val_features": {
                "input_audio_dirs": [str(DATA / "noise_train")],
                "output_filename": "noise_val_features.npy",
                "use_background_noise": True,
                "augmentation_rounds": 1},
        },
        "batch_composition": {"t": 96, "pa": 28, "pah": 20, "wa": 16,
                              "gen": 28, "dn": 36, "nz": 32},
        "feature_manifest": {
            "targets": {"t": f"{features}/positive_features.npy"},
            "negatives": {
                "pa": f"{features}/phoneme_adv_features.npy",
                "pah": f"{features}/phoneme_adv_hard_features.npy",
                "wa": f"{features}/word_adv_features.npy",
                "gen": f"{features}/generic_features.npy",
                "dn": f"{features}/dense_features.npy",
                "nz": f"{features}/noise_features.npy"},
            "targets_val": {"tv": f"{features}/positive_val_features.npy"},
            "negatives_val": {
                "nv": f"{features}/negative_val_features.npy",
                "nzv": f"{features}/noise_val_features.npy"},
        },
        "distillation": {"enabled": True, "steps": 8000},
        "checkpointing": {"enabled": True, "interval_steps": 2000,
                          "limit": 2},
        "enable_journaling": True,
        "show_training_summary": False,
        "debug_mode": False,
    }
    WORK.mkdir(parents=True, exist_ok=True)
    CONFIG_PATH.write_text(yaml.safe_dump(cfg, sort_keys=False))
    print(f"[prep] config written: {CONFIG_PATH}")


# --------------------------------------------------------------------------
# pipeline (-G -t -T -d through the real CLI entry)
# --------------------------------------------------------------------------

def stage_pipeline(stages="GtTd", overwrite=False):
    from nanowakeword_tpu.trainer import train
    flags = []
    if "G" in stages:
        flags.append("-G")
    if "t" in stages:
        flags.append("-t")
    if "T" in stages:
        flags.append("-T")
    if "d" in stages:
        flags.append("-d")
    if overwrite:
        flags.append("--overwrite")
    t0 = time.time()
    train(cli_args=["-c", str(CONFIG_PATH)] + flags)
    print(f"[pipeline {stages}] done in {time.time() - t0:.0f}s")


# --------------------------------------------------------------------------
# evaluate (CPU backend — edge-device conditions)
# --------------------------------------------------------------------------

def _eval_dir(interpreter, key, folder, desc):
    """Per-file score-trace streaming, exactly the
    evaluate_model_with_audio.py semantics (chunk 1280, reset per file).
    Returns (traces [files, chunks], seconds) — max over axis 1 is the
    reference evaluator's per-file score."""
    from test_model.evaluate_model_with_audio import (get_limited_files,
                                                      stream_scores)

    from nanowakeword_tpu.utils.audio_io import load_audio
    files = get_limited_files(str(folder), None)
    traces, seconds = [], 0.0
    t0 = time.time()
    for i, f in enumerate(files):
        audio = load_audio(f)
        if audio is None:
            continue
        seconds += len(audio) / SR
        traces.append(stream_scores(interpreter, audio, key))
        if (i + 1) % 50 == 0:
            rate = (i + 1) / (time.time() - t0)
            print(f"  [{desc}] {i + 1}/{len(files)} files "
                  f"({rate:.1f} files/s)", flush=True)
    return np.stack(traces) if traces else np.zeros((0, 1), np.float32), \
        seconds


def _patience_detect(traces, threshold, patience):
    """Per-file detection under the interpreter's patience post-filter
    (nanointerpreter.py `_apply_post_processing`): a hit fires only when
    the last `patience` consecutive 80-ms scores are ALL >= threshold."""
    hit = traces >= threshold
    run = np.ones_like(hit[:, patience - 1:], dtype=bool)
    for k in range(patience):
        run &= hit[:, k:k + run.shape[1]]
    return run.any(axis=1)


def stage_evaluate(model_suffix="", out_name="eval"):
    import jax
    jax.config.update("jax_platforms", "cpu")

    from nanowakeword_tpu import NanoInterpreter

    model_path = (TRAINED / MODEL_NAME / "model"
                  / f"{MODEL_NAME}{model_suffix}.nww")
    if not model_path.exists():
        sys.exit(f"[evaluate] model missing: {model_path}")
    interpreter = NanoInterpreter.load_model(str(model_path))
    key = list(interpreter.models.keys())[0]
    print(f"[evaluate] model={model_path.name} key={key} "
          f"threshold={THRESHOLD} backend=cpu")

    results = {"model": model_path.name, "threshold": THRESHOLD,
               "patience": PATIENCE}
    sets = {
        "positive": EVAL / "positive",
        "positive_resonator": EVAL / "positive_resonator",
        "positive_harmonic": EVAL / "positive_harmonic",
        "positive_fx": EVAL / "positive_fx",
        "negative_speech": EVAL / "negative_speech",
        "negative_adversarial": EVAL / "negative_adversarial",
        "noise": EVAL / "noise",
    }
    trace_dir = WORK / f"traces{model_suffix}"
    trace_dir.mkdir(parents=True, exist_ok=True)
    for name, folder in sets.items():
        traces, seconds = _eval_dir(interpreter, key, folder, name)
        np.save(trace_dir / f"{name}.npy", traces)
        scores = traces.max(axis=1) if traces.size else np.zeros(0)
        hours = seconds / 3600.0
        if name.startswith("positive"):
            detected = int((scores >= THRESHOLD).sum())
            det_pat = int(_patience_detect(traces, THRESHOLD,
                                           PATIENCE).sum())
            results[name] = {
                "files": len(scores), "hours": round(hours, 3),
                "detected": detected,
                "miss_rate_pct": round(
                    100.0 * (1 - detected / max(len(scores), 1)), 2),
                "miss_rate_pct_patience": round(
                    100.0 * (1 - det_pat / max(len(scores), 1)), 2),
                "median_max_score": round(float(np.median(scores)), 4)
                if len(scores) else None,
            }
        else:
            alarms = int((scores > THRESHOLD).sum())
            alarms_pat = int(_patience_detect(traces, THRESHOLD,
                                              PATIENCE).sum())
            results[name] = {
                "files": len(scores), "hours": round(hours, 3),
                "false_alarm_files": alarms,
                "fa_per_hour": round(alarms / max(hours, 1e-9), 3),
                "false_alarm_files_patience": alarms_pat,
                "fa_per_hour_patience": round(
                    alarms_pat / max(hours, 1e-9), 3),
                "max_score_seen": round(float(scores.max()), 4)
                if len(scores) else None,
            }
        print(f"  {name}: {results[name]}")

    WORK.mkdir(exist_ok=True)
    out = WORK / f"{out_name}{model_suffix}.json"
    out.write_text(json.dumps(results, indent=2))
    print(f"[evaluate] wrote {out}")
    return results


# --------------------------------------------------------------------------
# sweep: pick the production operating point from recorded traces
# --------------------------------------------------------------------------

def stage_sweep():
    """Grid patience x threshold over the full model's recorded traces.

    Round-4 finding: threshold 0.90 + patience 3 silently dropped 64% of
    never-trained-channel positives (transfer detections spike too briefly
    for 3 consecutive frames). The sweep selects the operating point that
    keeps speech+noise patience-filtered FA at ZERO, then minimises
    transfer miss, then adversarial FA, then in-domain miss. Written to
    sweep.json; report() publishes the winner as `operating_point`."""
    trace_dir = WORK / "traces"
    traces = {}
    for name in ("positive", "positive_resonator", "positive_harmonic",
                 "positive_fx", "negative_speech", "negative_adversarial",
                 "noise"):
        p = trace_dir / f"{name}.npy"
        if p.exists():
            traces[name] = np.load(p)
    if not traces:
        sys.exit("[sweep] no traces; run `evaluate` first")

    grid = []
    for patience in (1, 2, 3, 4):
        for thr in (0.80, 0.85, 0.90, 0.92, 0.95):
            row = {"patience": patience, "threshold": thr}
            for name, tr in traces.items():
                det = _patience_detect(tr, thr, patience)
                if name.startswith("positive"):
                    row[f"{name}_miss_pct"] = round(
                        100.0 * (1 - det.sum() / max(len(det), 1)), 2)
                else:
                    hours = tr.shape[0] * tr.shape[1] * 0.08 / 3600.0
                    row[f"{name}_fa_per_h"] = round(
                        det.sum() / max(hours, 1e-9), 2)
            grid.append(row)

    def key(row):
        clean_fa = (row.get("negative_speech_fa_per_h", 9e9)
                    + row.get("noise_fa_per_h", 9e9))
        # transfer = the never-trained fx chain when measured, else the
        # held-out rendering channels
        transfer = row.get(
            "positive_fx_miss_pct",
            row.get("positive_harmonic_miss_pct", 100.0)
            + row.get("positive_resonator_miss_pct", 100.0))
        return (clean_fa > 0.0,                       # hard constraint
                transfer,
                row.get("negative_adversarial_fa_per_h", 9e9),
                row.get("positive_miss_pct", 100.0))
    best = min(grid, key=key)

    # stress-set ROC (VERDICT r4 weak #3): adversarial FA/h vs in-domain +
    # transfer miss along the threshold axis at the chosen patience — the
    # measured tradeoff curve a deployer tunes on
    roc = []
    if "negative_adversarial" in traces:
        for thr in np.arange(0.80, 0.995, 0.01):
            thr = round(float(thr), 3)
            adv = _patience_detect(traces["negative_adversarial"], thr,
                                   best["patience"])
            hours = (traces["negative_adversarial"].shape[0]
                     * traces["negative_adversarial"].shape[1] * 0.08
                     / 3600.0)
            point = {"threshold": thr,
                     "adversarial_fa_per_h": round(adv.sum() / hours, 2)}
            for pos in ("positive", "positive_fx"):
                if pos in traces:
                    det = _patience_detect(traces[pos], thr,
                                           best["patience"])
                    point[f"{pos}_miss_pct"] = round(
                        100.0 * (1 - det.sum() / len(det)), 2)
            roc.append(point)

    out = {"grid": grid, "operating_point": best,
           "adversarial_roc_at_selected_patience": roc,
           "selection_rule": ("speech+noise patience FA == 0, then min "
                              "transfer miss (harmonic+resonator), then "
                              "min adversarial FA, then min in-domain "
                              "miss")}
    (WORK / "sweep.json").write_text(json.dumps(out, indent=2))
    print(f"[sweep] operating point: {best}")
    return out


# --------------------------------------------------------------------------
# cascade: evaluate gate+verifier AS DEPLOYED (VERDICT r4 missing #2)
# --------------------------------------------------------------------------

def stage_evaluate_cascade():
    """Stream every eval set through load_model(cascade=True) — the
    reference's flagship serving mode (`nanointerpreter.py:443-487,
    665-674`): the `<stem>_lite` gate scores every chunk, and the verifier
    only runs (general path) / only counts (fused path) when the gate
    clears gate_threshold. Reports COMPOSED miss/FA at the production
    operating point plus the verifier-invocation rate — the compute the
    cascade saves on edge hardware."""
    import jax
    jax.config.update("jax_platforms", "cpu")

    from nanowakeword_tpu import NanoInterpreter

    from nanowakeword_tpu.utils.audio_io import load_audio
    from test_model.evaluate_model_with_audio import get_limited_files

    model_path = TRAINED / MODEL_NAME / "model" / f"{MODEL_NAME}.nww"
    interpreter = NanoInterpreter.load_model(str(model_path), cascade=True)
    if not interpreter.cascade_config:
        sys.exit("[cascade] no lite gate found — run the -d stage first")
    gate_key = interpreter.cascade_config["gate"]
    verifier_key = interpreter.cascade_config["verifier"]
    gate_thr = interpreter.cascade_config["gate_threshold"]
    print(f"[cascade] gate={gate_key} verifier={verifier_key} "
          f"gate_threshold={gate_thr} threshold={THRESHOLD} "
          f"patience={PATIENCE}")

    op = {"threshold": THRESHOLD, "patience": PATIENCE}
    sweep_path = WORK / "sweep.json"
    if sweep_path.exists():
        sel = json.loads(sweep_path.read_text())["operating_point"]
        op = {"threshold": sel["threshold"], "patience": sel["patience"]}
        print(f"[cascade] using swept operating point: {op}")

    results = {"model": model_path.name, "gate": gate_key,
               "gate_threshold": gate_thr, **op}
    sets = {
        "positive": EVAL / "positive",
        "positive_resonator": EVAL / "positive_resonator",
        "positive_harmonic": EVAL / "positive_harmonic",
        "positive_fx": EVAL / "positive_fx",
        "negative_speech": EVAL / "negative_speech",
        "negative_adversarial": EVAL / "negative_adversarial",
        "noise": EVAL / "noise",
    }
    trace_dir = WORK / "traces_cascade"
    trace_dir.mkdir(parents=True, exist_ok=True)
    for name, folder in sets.items():
        files = get_limited_files(str(folder), None)
        v_traces, g_traces, seconds = [], [], 0.0
        t0 = time.time()
        for i, f in enumerate(files):
            audio = load_audio(f)
            if audio is None:
                continue
            seconds += len(audio) / SR
            interpreter.reset()
            v_row, g_row = [], []
            for s in range(0, len(audio), 1280):
                chunk = audio[s:s + 1280]
                if len(chunk) < 1280:
                    break
                res = interpreter.predict(chunk.astype(np.int16))
                v_row.append(res.get(verifier_key, 0.0))
                g_row.append(res.get(gate_key, 0.0))
            v_traces.append(np.asarray(v_row, np.float32))
            g_traces.append(np.asarray(g_row, np.float32))
            if (i + 1) % 50 == 0:
                print(f"  [cascade {name}] {i + 1}/{len(files)} "
                      f"({(i + 1) / (time.time() - t0):.1f} files/s)",
                      flush=True)
        vt = np.stack(v_traces)
        gt = np.stack(g_traces)
        np.save(trace_dir / f"{name}_verifier.npy", vt)
        np.save(trace_dir / f"{name}_gate.npy", gt)
        det = _patience_detect(vt, op["threshold"], op["patience"])
        hours = seconds / 3600.0
        # the verifier runs only on gate-cleared chunks (the general
        # path's genuine skip, predict():cascade gate check)
        invoke_rate = float((gt >= gate_thr).mean())
        entry = {"files": len(vt), "hours": round(hours, 3),
                 "verifier_invocation_rate": round(invoke_rate, 4)}
        if name.startswith("positive"):
            entry["miss_rate_pct_patience"] = round(
                100.0 * (1 - det.sum() / max(len(det), 1)), 2)
        else:
            entry["false_alarm_files_patience"] = int(det.sum())
            entry["fa_per_hour_patience"] = round(
                det.sum() / max(hours, 1e-9), 3)
        results[name] = entry
        print(f"  {name}: {entry}")

    rates = [results[n]["verifier_invocation_rate"] for n in sets
             if n.startswith("negative") or n == "noise"]
    results["verifier_skip_rate_negatives"] = round(
        1.0 - float(np.mean(rates)), 4)
    (WORK / "eval_cascade.json").write_text(json.dumps(results, indent=2))
    print(f"[cascade] wrote {WORK / 'eval_cascade.json'}")
    return results


# --------------------------------------------------------------------------
# report
# --------------------------------------------------------------------------

def stage_report():
    import shutil
    RESULTS_DIR.mkdir(exist_ok=True)
    merged = {}
    for suffix in ("", "_lite"):
        p = WORK / f"eval{suffix}.json"
        if p.exists():
            merged["full_model" if not suffix else "lite_gate"] = (
                json.loads(p.read_text()))
    for src, dest in (("sweep.json", "operating_point_sweep"),
                      ("eval_cascade.json", "cascade")):
        p = WORK / src
        if p.exists():
            data = json.loads(p.read_text())
            merged[dest] = (data if dest != "operating_point_sweep"
                            else {"operating_point": data["operating_point"],
                                  "selection_rule": data["selection_rule"]})
    # training final report (stable loss + logit margins) from the journal db
    db = TRAINED / ".cache" / "journal_cache" / "training_history.json"
    if db.exists():
        runs = json.loads(db.read_text())
        if runs:
            merged["training_final_report"] = runs[-1].get("metrics", {})
    merged["reference_anecdotes"] = {
        "stable_loss": 0.0086, "avg_pos_logit": 5.447,
        "avg_neg_logit": -5.721,
        "false_positive_rate": "<1 per 16-28 h (real-world audio)",
        "source": "/root/reference/README.md:325-333"}
    (RESULTS_DIR / "results.json").write_text(json.dumps(merged, indent=2))

    for suffix in ("", "_lite"):
        src = TRAINED / MODEL_NAME / "model" / f"{MODEL_NAME}{suffix}.nww"
        if src.exists():
            shutil.copy2(src, RESULTS_DIR / src.name)
    shutil.copy2(CONFIG_PATH, RESULTS_DIR / "config_hey_nano.yaml")
    print(f"[report] wrote {RESULTS_DIR}/results.json + artifacts")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("stage", choices=["prep", "pipeline", "evaluate",
                                      "evaluate_lite", "sweep", "cascade",
                                      "report", "all"])
    ap.add_argument("--stages", default="GtTd",
                    help="pipeline stages subset, e.g. 'GT'")
    ap.add_argument("--force", action="store_true")
    ap.add_argument("--overwrite", action="store_true",
                    help="pipeline: regenerate existing feature files")
    args = ap.parse_args()

    if args.stage == "prep":
        stage_prep(force=args.force)
    elif args.stage == "pipeline":
        stage_pipeline(args.stages, overwrite=args.overwrite)
    elif args.stage == "evaluate":
        stage_evaluate()
    elif args.stage == "evaluate_lite":
        stage_evaluate(model_suffix="_lite")
    elif args.stage == "sweep":
        stage_sweep()
    elif args.stage == "cascade":
        stage_evaluate_cascade()
    elif args.stage == "report":
        stage_report()
    else:
        # Separate processes per stage: pipeline wants the TPU backend,
        # evaluate forces CPU; jax backends are process-global.
        me = [sys.executable, __file__]
        for sub in (["prep"], ["pipeline"], ["evaluate"],
                    ["evaluate_lite"], ["sweep"], ["cascade"], ["report"]):
            print(f"[all] === {sub[0]} ===", flush=True)
            rc = subprocess.call(me + sub)
            if rc != 0:
                sys.exit(rc)


if __name__ == "__main__":
    main()
