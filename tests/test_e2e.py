"""End-to-end pipeline: synth clips -> features -> train -> export -> stream.

This is the framework's integration gate (SURVEY.md §7 step 2): a tiny
dataset flows through every layer — TTS generation, device augmentation,
feature memmaps, ISBL sampling, jitted training, .nww export, and the
streaming interpreter — in one test, CPU-sized.
"""

import os

import numpy as np
import pytest
import yaml

from nanowakeword_tpu.utils.audio_io import write_wav


@pytest.fixture(scope="module")
def project(tmp_path_factory):
    """Build a miniature project: positive/negative clips + noise."""
    root = tmp_path_factory.mktemp("e2e")
    rng = np.random.default_rng(10)

    from nanowakeword_tpu.data.generator.tts import formant_synthesize

    pos_dir, neg_dir, noise_dir = (root / "positive", root / "negative",
                                   root / "noise")
    for d in (pos_dir, neg_dir, noise_dir):
        d.mkdir()
    for i in range(6):
        audio = formant_synthesize("hey nano", seed=i, f0=100 + 15 * i)
        write_wav(str(pos_dir / f"pos_{i}.wav"), audio * 32767)
        audio = formant_synthesize("ok tomato", seed=100 + i, f0=100 + 15 * i)
        write_wav(str(neg_dir / f"neg_{i}.wav"), audio * 32767)
    for i in range(3):
        noise = rng.normal(0, 1500, 32000)
        write_wav(str(noise_dir / f"noise_{i}.wav"), noise)

    return {"root": root, "pos": pos_dir, "neg": neg_dir, "noise": noise_dir}


@pytest.fixture(scope="module")
def config_path(project):
    root = project["root"]
    cfg = {
        "model_name": "e2e_test_model",
        "output_dir": str(root / "trained_models"),
        "positive_data_path": str(project["pos"]),
        "negative_data_path": str(project["neg"]),
        "background_paths": [str(project["noise"])],
        "rir_paths": [],
        "model_type": "dnn",
        "layer_size": 16,
        "n_blocks": 1,
        "embedding_dim": 16,
        "dropout_prob": 0.2,
        "activation_function": "relu",
        "steps": 40,
        "stabilization_steps": 5,
        "early_stopping_patience": 0,
        "optimizer_type": "adamw",
        "learning_rate_max": 0.001,
        "lr_scheduler_type": "onecycle",
        "augmentation_batch_size": 4,
        "clip_length_samples": 32000,
        "augmentation_settings": {
            "min_snr_in_db": 10.0, "max_snr_in_db": 30.0,
            "pitch_prob": 0.3, "gain_prob": 1.0, "rir_prob": 0.0,
        },
        "feature_generation_manifest": {
            "pos_features": {
                "input_audio_dirs": [str(project["pos"])],
                "output_filename": "positive_features.npy",
                "use_background_noise": True,
                "augmentation_rounds": 2,
            },
            "neg_features": {
                "input_audio_dirs": [str(project["neg"])],
                "output_filename": "negative_features.npy",
                "use_background_noise": True,
                "augmentation_rounds": 2,
            },
        },
        "batch_composition": {"t": 4, "n": 8},
        "feature_manifest": {
            "targets": {"t": str(root / "trained_models/e2e_test_model/"
                                        "features/positive_features.npy")},
            "negatives": {"n": str(root / "trained_models/e2e_test_model/"
                                          "features/negative_features.npy")},
        },
        "distillation": {"enabled": True, "steps": 20,
                         "student_layer_size": 8, "student_n_blocks": 1,
                         "student_embedding_dim": 8},
        "checkpointing": {"enabled": True, "interval_steps": 20, "limit": 2},
        "enable_journaling": True,
        "show_training_summary": False,
        "debug_mode": False,
    }
    path = root / "config.yaml"
    path.write_text(yaml.safe_dump(cfg))
    return str(path)


@pytest.mark.slow
def test_full_pipeline(project, config_path):
    from nanowakeword_tpu.trainer import train

    train(cli_args=["-c", config_path, "-t", "-T", "-d"])

    root = project["root"]
    model_dir = root / "trained_models" / "e2e_test_model" / "model"
    main_artifact = model_dir / "e2e_test_model.nww"
    lite_artifact = model_dir / "e2e_test_model_lite.nww"
    assert main_artifact.exists(), "main model artifact missing"
    assert lite_artifact.exists(), "distilled lite artifact missing"

    # journal written
    assert (root / "trained_models" / "training_journal.md").exists()

    # features exist and have the contract shape [N, 16, 96] (2 s clips)
    feats = np.load(root / "trained_models" / "e2e_test_model" / "features"
                    / "positive_features.npy", mmap_mode="r")
    assert feats.shape[1:] == (16, 96)
    assert feats.shape[0] > 0

    # checkpoints rotated to the limit
    ckpts = list((root / "trained_models" / "e2e_test_model"
                  / "training_artifacts" / "checkpoints").glob("*.pkl"))
    assert 0 < len(ckpts) <= 2

    # -- interpreter: stream a clip through the exported model --------------
    from nanowakeword_tpu.interpreter.nanointerpreter import NanoInterpreter
    interpreter = NanoInterpreter.load_model(str(main_artifact))
    from nanowakeword_tpu.data.generator.tts import formant_synthesize
    clip = (formant_synthesize("hey nano", seed=999) * 32767).astype(np.int16)
    results = interpreter.predict_clip(clip)
    assert len(results) == int(np.ceil(len(clip) / 1280))
    scores = [r.score for r in results]
    assert all(0.0 <= s <= 1.0 for s in scores)

    # cascade mode: auto-discovers the lite gate
    cascade = NanoInterpreter.load_model(str(main_artifact), cascade=True)
    assert cascade.is_cascade
    assert cascade.gate_name == "e2e_test_model_lite"
    cascade.predict_clip(clip)

    # --info surface
    from nanowakeword_tpu.export.artifact import read_nww_header
    header = read_nww_header(str(main_artifact))
    assert header["model_type"] == "dnn"
    assert header["input_shape"] == [16, 96]
    assert header["has_encoder"]


@pytest.mark.slow
def test_resume_from_checkpoint(project, config_path):
    """--resume from a MID-RUN checkpoint continues to the full budget and
    re-exports the final artifact (reference: train_model.py:435-491)."""
    from nanowakeword_tpu.trainer import train

    project_dir = project["root"] / "trained_models" / "e2e_test_model"
    ckpt_dir = project_dir / "training_artifacts" / "checkpoints"
    # keep only the mid-run (step-20) checkpoint so the resumed run really
    # has steps left to train
    for f in ckpt_dir.glob("checkpoint_step_*"):
        step = int(f.stem.split("_")[-1])
        if step > 20:
            f.unlink()
    assert (ckpt_dir / "checkpoint_step_20.pkl").exists()
    artifact = project_dir / "model" / "e2e_test_model.nww"
    before_mtime = artifact.stat().st_mtime

    train(cli_args=["-c", config_path, "-T", "--resume", str(project_dir)])

    # trained the remaining 19 steps and rebuilt the final model
    assert artifact.stat().st_mtime > before_mtime
    new_ckpts = sorted(int(f.stem.split("_")[-1])
                       for f in ckpt_dir.glob("checkpoint_step_*"))
    assert new_ckpts and new_ckpts[0] >= 20
