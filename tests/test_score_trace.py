"""Score-trace equivalence: streaming per-frame scores == batch-pipeline
scores within 1e-3 (the BASELINE bar).

The batch path computes features for a whole clip at once (the training /
evaluate_model_with_features path); the streaming path feeds the interpreter
80 ms chunks (the recognize_from_mic path). For every frame where the
model's feature window is fully inside real audio, the sigmoid scores of the
two paths must agree to <= 1e-3.
"""

import numpy as np
import pytest

from nanowakeword_tpu.data.features import AudioFeatures
from nanowakeword_tpu.export.artifact import save_nww
from nanowakeword_tpu.interpreter.nanointerpreter import NanoInterpreter
from nanowakeword_tpu.models.model import Model

N_FRAMES = 16  # model context (2 s within a longer clip)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("trace")
    cfg = {"activation_function": "relu", "embedding_dim": 32}
    model = Model(config=cfg, model_name="trace", input_shape=(N_FRAMES, 96),
                  model_type="dnn", layer_dim=32, n_blocks=2,
                  dropout_prob=0.0)
    # bundle the SAME encoder the batch frontend defaults to (the pipeline
    # invariant: export and feature extraction share default_encoder_variables)
    from nanowakeword_tpu.data.features import default_encoder_variables
    path = str(root / "trace.nww")
    save_nww(path, model=model, config=cfg, model_name="trace",
             encoder_variables=default_encoder_variables())
    return path, model


def test_streaming_score_trace_matches_batch(setup):
    artifact, model = setup
    rng = np.random.default_rng(42)
    clip = rng.integers(-16000, 16000, 16000 * 5).astype(np.int16)

    # batch path: full-clip features, score every 16-frame window
    af = AudioFeatures()
    feats = af.embed_clips(clip.astype(np.float32)[None])[0]  # [F, 96]
    n_windows = feats.shape[0] - N_FRAMES + 1
    batch_scores = []
    for i in range(n_windows):
        logits = model(feats[None, i:i + N_FRAMES])
        batch_scores.append(float(1 / (1 + np.exp(-np.asarray(logits)[0, 0]))))

    # streaming path
    interp = NanoInterpreter.load_model(artifact)
    stream_scores = [r.get("trace") for r in interp.predict_clip(clip)]

    # Alignment: streaming chunk c (0-based) scores the feature window ENDING
    # at frame index c (features emitted one per chunk); batch window i spans
    # feature frames [i, i+16). The window is fully real once every frame in
    # it came from real audio: frames are emitted from chunk 9 onward (the
    # first 9 chunks fill the 76-frame mel window), so chunk c >= 9+15+16
    # conservatively has a clean 16-frame history mapping to batch window
    # i = c - 9 - 15.
    tol_violations = []
    for c in range(40, len(stream_scores)):
        i = c - 24
        if 0 <= i < n_windows:
            diff = abs(stream_scores[c] - batch_scores[i])
            tol_violations.append((c, i, diff))
    assert tol_violations, "no comparable frames found"
    max_diff = max(d for _, _, d in tol_violations)
    assert max_diff <= 1e-3, f"score trace diverged: max diff {max_diff}"
