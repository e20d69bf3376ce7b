"""Artifact format, custom export hooks, name autogen, journal."""

import json
import os

import numpy as np
import pytest

from nanowakeword_tpu.export.artifact import (export_model, load_nww,
                                              read_nww_header, save_nww)
from nanowakeword_tpu.export.custom_export import (auto_gen_name,
                                                   export_custom_model)
from nanowakeword_tpu.models.model import Model


@pytest.fixture
def model():
    cfg = {"activation_function": "relu", "embedding_dim": 16}
    return Model(config=cfg, model_name="arti", input_shape=(16, 96),
                 model_type="dnn", layer_dim=16, n_blocks=1), cfg


class TestArtifact:
    def test_roundtrip_preserves_outputs(self, tmp_path, model):
        m, cfg = model
        x = np.random.default_rng(0).normal(size=(4, 16, 96)).astype(
            np.float32)
        before = np.asarray(m(x))
        path = str(tmp_path / "arti.nww")
        save_nww(path, model=m, config=cfg, model_name="arti")
        header, restored, enc = load_nww(path)
        after = np.asarray(restored(x))
        np.testing.assert_allclose(before, after, rtol=1e-6)
        assert header["model_type"] == "dnn"
        assert enc is None

    def test_encoder_bundling(self, tmp_path, model):
        m, cfg = model
        from nanowakeword_tpu.data.features import _default_encoder_variables
        enc_vars = _default_encoder_variables()
        path = str(tmp_path / "with_enc.nww")
        save_nww(path, model=m, config=cfg, model_name="arti",
                 encoder_variables=enc_vars)
        header, _, enc = load_nww(path)
        assert header["has_encoder"]
        assert enc is not None

    def test_header_readable_without_payload(self, tmp_path, model):
        m, cfg = model
        path = str(tmp_path / "h.nww")
        save_nww(path, model=m, config=cfg, model_name="arti")
        header = read_nww_header(path)
        assert header["input_shape"] == [16, 96]
        assert header["n_params"] == m.n_params()

    def test_rejects_non_artifact(self, tmp_path):
        bad = tmp_path / "not.nww"
        bad.write_bytes(b"garbage file")
        with pytest.raises(ValueError, match="not a .nww"):
            read_nww_header(str(bad))

    def test_arch_config_survives(self, tmp_path):
        cfg = {"activation_function": "gelu", "embedding_dim": 24,
               "tcn_channels": [8, 16], "tcn_kernel_size": 5}
        m = Model(config=cfg, model_name="t", input_shape=(16, 96),
                  model_type="tcn", layer_dim=8, n_blocks=1)
        path = str(tmp_path / "tcn.nww")
        save_nww(path, model=m, config=cfg, model_name="t")
        x = np.zeros((2, 16, 96), np.float32)
        _, restored, _ = load_nww(path)
        np.testing.assert_allclose(np.asarray(m(x)), np.asarray(restored(x)),
                                   rtol=1e-6)


class TestCustomExport:
    def test_script_hook(self, tmp_path, model):
        m, cfg = model
        hook = tmp_path / "hook.py"
        marker = tmp_path / "ran.json"
        hook.write_text(
            "import json\n"
            "def export_model(model, input_shape, config, model_name, "
            "output_dir):\n"
            f"    json.dump({{'name': model_name}}, open(r'{marker}', 'w'))\n")
        cfg2 = dict(cfg)
        cfg2["custom_export"] = {"script": str(hook)}
        ok = export_custom_model(m, (16, 96), cfg2, "arti", str(tmp_path))
        assert ok and marker.exists()
        assert json.load(open(marker))["name"] == "arti"

    def test_command_hook(self, tmp_path, model):
        m, cfg = model
        export_model(m, (16, 96), cfg, "arti", str(tmp_path))
        cfg2 = dict(cfg)
        cfg2["custom_export"] = {
            "command": "cp {model_path} {output_dir}/copied_{model_name}.nww"}
        ok = export_custom_model(m, (16, 96), cfg2, "arti", str(tmp_path))
        assert ok and (tmp_path / "copied_arti.nww").exists()

    def test_no_config_is_noop(self, model):
        m, cfg = model
        assert export_custom_model(m, (16, 96), cfg, "x", ".") is False


class TestAutoGenName:
    def test_versioning(self, tmp_path):
        assert auto_gen_name("dnn", str(tmp_path)) == "nww_dnn_model_v1"
        (tmp_path / "nww_dnn_model_v1").mkdir()
        (tmp_path / "nww_dnn_model_v3").mkdir()
        assert auto_gen_name("dnn", str(tmp_path)) == "nww_dnn_model_v4"
        assert auto_gen_name("gru", str(tmp_path)) == "nww_gru_model_v1"


class TestJournal:
    def test_changed_params_only(self, tmp_path):
        from nanowakeword_tpu.utils.journal import update_training_journal
        base = str(tmp_path)
        update_training_journal(base, "run1", {"Stable Loss": "0.01"},
                                {"lr": 0.001, "steps": 100})
        update_training_journal(base, "run2", {"Stable Loss": "0.02"},
                                {"lr": 0.002, "steps": 100})
        md = (tmp_path / "training_journal.md").read_text()
        assert "run1" in md and "run2" in md
        assert "(baseline run)" in md
        # second run shows only the changed lr, not steps
        second_row = [l for l in md.splitlines() if "run2" in l][0]
        assert "lr=0.002" in second_row and "steps" not in second_row
        db = json.load(open(tmp_path / ".cache" / "journal_cache"
                            / "training_history.json"))
        assert len(db) == 2


class TestInt8Artifacts:
    def test_int8_quarters_size_and_roundtrips(self, tmp_path, model):
        m, cfg = model
        x = np.random.default_rng(0).normal(size=(4, 16, 96)).astype(
            np.float32)
        before = np.asarray(m(x))

        p32 = str(tmp_path / "f32.nww")
        p8 = str(tmp_path / "int8.nww")
        save_nww(p32, model=m, config=cfg, model_name="arti")
        save_nww(p8, model=m, config=cfg, model_name="arti",
                 weights_dtype="int8")
        assert os.path.getsize(p8) < 0.45 * os.path.getsize(p32)

        header, restored, _ = load_nww(p8)
        assert header["weights_dtype"] == "int8"
        # per-channel symmetric int8: kernels within 1/127 of their
        # channel max, so score drift stays in the noise
        after = np.asarray(restored(x))
        np.testing.assert_allclose(before, after, atol=0.02)
        import jax
        assert all(l.dtype == np.float32 or not np.issubdtype(l.dtype,
                                                              np.floating)
                   for l in jax.tree_util.tree_leaves(
                       restored.variables))

    def test_int8_encoder_bundle_roundtrips(self, tmp_path, model):
        m, cfg = model
        from nanowakeword_tpu.data.features import _default_encoder_variables
        import jax
        enc_vars = _default_encoder_variables()
        path = str(tmp_path / "enc8.nww")
        save_nww(path, model=m, config=cfg, model_name="arti",
                 encoder_variables=enc_vars, weights_dtype="int8")
        _, _, enc = load_nww(path)
        orig = jax.tree_util.tree_leaves(enc_vars)
        back = jax.tree_util.tree_leaves(enc)
        assert len(orig) == len(back)
        for o, b in zip(orig, back):
            o, b = np.asarray(o), np.asarray(b)
            assert b.dtype == o.dtype and b.shape == o.shape
            if o.dtype == np.float32 and o.size:
                span = max(float(np.abs(o).max()), 1e-6)
                assert float(np.abs(o - b).max()) <= span / 100.0

    def test_unknown_weights_dtype_rejected(self, tmp_path, model):
        m, cfg = model
        with pytest.raises(ValueError, match="weights_dtype"):
            save_nww(str(tmp_path / "x.nww"), model=m, config=cfg,
                     model_name="arti", weights_dtype="int4")


class TestBf16Artifacts:
    def test_bf16_halves_size_and_roundtrips(self, tmp_path, model):
        m, cfg = model
        x = np.random.default_rng(0).normal(size=(4, 16, 96)).astype(
            np.float32)
        before = np.asarray(m(x))

        p32 = str(tmp_path / "f32.nww")
        p16 = str(tmp_path / "bf16.nww")
        save_nww(p32, model=m, config=cfg, model_name="arti")
        save_nww(p16, model=m, config=cfg, model_name="arti",
                 weights_dtype="bfloat16")
        assert os.path.getsize(p16) < 0.65 * os.path.getsize(p32)

        header, restored, _ = load_nww(p16)
        assert header["weights_dtype"] == "bfloat16"
        after = np.asarray(restored(x))
        # bf16 quantisation noise only
        np.testing.assert_allclose(before, after, atol=0.05)
        # restored weights are float32 again (ready for training/serving)
        import jax
        assert all(l.dtype == np.float32 or not np.issubdtype(l.dtype,
                                                              np.floating)
                   for l in jax.tree_util.tree_leaves(
                       restored.variables))
