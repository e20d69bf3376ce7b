"""End-to-end frontend training: gradients reach the encoder; export works."""

import numpy as np
import pytest
import yaml

from nanowakeword_tpu.utils.audio_io import write_wav


@pytest.fixture(scope="module")
def audio_project(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e_frontend")
    from nanowakeword_tpu.data.generator.tts import formant_synthesize
    for sub, phrase, base_seed in [("positive", "hey nano", 0),
                                   ("negative", "ok tomato", 50)]:
        d = root / sub
        d.mkdir()
        for i in range(5):
            audio = formant_synthesize(phrase, seed=base_seed + i,
                                       f0=110 + 18 * i)
            write_wav(str(d / f"{sub}_{i}.wav"), audio * 32767)
    return root


class TestE2EModule:
    def test_gradients_reach_encoder(self):
        import jax
        import jax.numpy as jnp
        from nanowakeword_tpu.models.model import Model
        from nanowakeword_tpu.train.e2e import E2EModel

        cfg = {"activation_function": "relu", "embedding_dim": 16}
        clf = Model(config=cfg, model_name="e2e", input_shape=(16, 96),
                    model_type="dnn", layer_dim=16, n_blocks=1,
                    dropout_prob=0.0)
        e2e = E2EModel(clf, clip_samples=16000, context_frames=4)

        audio = jnp.asarray(np.random.default_rng(0).integers(
            -8000, 8000, (2, 16000)).astype(np.float32))

        def loss(params):
            logits = e2e.module.apply({"params": params}, audio)
            return jnp.sum(logits ** 2)

        grads = jax.grad(loss)(e2e.params)
        enc_grads = grads["encoder"]
        g = np.concatenate([np.asarray(x).ravel()
                            for x in __import__("jax").tree_util.tree_leaves(
                                enc_grads)])
        assert np.abs(g).max() > 0, "no gradient reached the encoder"

    def test_freeze_encoder_blocks_gradients(self):
        import jax
        import jax.numpy as jnp
        from nanowakeword_tpu.models.model import Model
        from nanowakeword_tpu.train.e2e import E2EModel

        cfg = {"activation_function": "relu", "embedding_dim": 16}
        clf = Model(config=cfg, model_name="e2e", input_shape=(16, 96),
                    model_type="dnn", layer_dim=16, n_blocks=1,
                    dropout_prob=0.0)
        e2e = E2EModel(clf, clip_samples=16000, context_frames=4,
                       freeze_encoder=True)
        audio = jnp.zeros((2, 16000))

        def loss(params):
            return jnp.sum(e2e.module.apply({"params": params}, audio) ** 2)

        grads = jax.grad(loss)(e2e.params)
        g = np.concatenate([np.asarray(x).ravel()
                            for x in jax.tree_util.tree_leaves(
                                grads["encoder"])])
        assert np.abs(g).max() == 0.0

    def test_split_variables_roundtrip(self):
        import jax
        from nanowakeword_tpu.data.features import AudioFeatures
        from nanowakeword_tpu.models.model import Model
        from nanowakeword_tpu.train.e2e import E2EModel, split_variables

        cfg = {"activation_function": "relu", "embedding_dim": 16}
        clf = Model(config=cfg, model_name="e2e", input_shape=(16, 96),
                    model_type="dnn", layer_dim=16, n_blocks=1)
        e2e = E2EModel(clf, clip_samples=16000, context_frames=4)
        enc_vars, clf_vars = split_variables(e2e.variables)

        # encoder half must slot into AudioFeatures
        af = AudioFeatures(encoder_variables=enc_vars)
        out = af.embed_clips(np.zeros((1, 16000), np.float32))
        assert out.shape == (1, 3, 96)

        # classifier half must have the Model's structure
        ref_paths = {jax.tree_util.keystr(p) for p, _ in
                     jax.tree_util.tree_leaves_with_path(clf.variables)}
        got_paths = {jax.tree_util.keystr(p) for p, _ in
                     jax.tree_util.tree_leaves_with_path(clf_vars)}
        assert ref_paths == got_paths


@pytest.mark.slow
def test_e2e_pipeline_trains_and_exports(audio_project, tmp_path):
    from nanowakeword_tpu.trainer import train

    cfg = {
        "model_name": "e2e_frontend_model",
        "output_dir": str(tmp_path / "trained"),
        "positive_data_path": str(audio_project / "positive"),
        "negative_data_path": str(audio_project / "negative"),
        "model_type": "dnn", "layer_size": 16, "n_blocks": 1,
        "embedding_dim": 16, "dropout_prob": 0.1,
        "steps": 25, "early_stopping_patience": 0,
        "optimizer_type": "adamw", "learning_rate_max": 1e-3,
        "lr_scheduler_type": "onecycle",
        "end_to_end": {
            "enabled": True,
            "clip_samples": 16000,
            "context_frames": 4,
            "audio_manifest": {
                "targets": [str(audio_project / "positive")],
                "negatives": [str(audio_project / "negative")],
            },
        },
        "batch_composition": {"targets": 4, "negatives": 8},
        "distillation": {"enabled": False},
        "show_training_summary": False,
        "enable_journaling": False,
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    train(cli_args=["-c", str(cfg_path), "-T"])

    artifact = (tmp_path / "trained" / "e2e_frontend_model" / "model"
                / "e2e_frontend_model.nww")
    assert artifact.exists()

    from nanowakeword_tpu.export.artifact import read_nww_header
    header = read_nww_header(str(artifact))
    assert header["has_encoder"], "trained encoder not bundled"

    # the interpreter must load it and stream with the trained encoder
    from nanowakeword_tpu.interpreter.nanointerpreter import NanoInterpreter
    interp = NanoInterpreter.load_model(str(artifact))
    results = interp.predict_clip(np.zeros(1280 * 10, np.int16))
    assert len(results) == 10
