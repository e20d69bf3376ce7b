"""CLI surface: flag routing, config-driven stages, --info."""

import sys

import numpy as np
import pytest
import yaml

from nanowakeword_tpu import cli


class TestParser:
    def test_training_flags(self):
        p = cli._build_parser()
        args = p.parse_args(["-c", "cfg.yaml", "-G", "-t", "-T", "-d",
                             "--overwrite", "--resume", "proj"])
        assert args.config == "cfg.yaml"
        assert args.generate_clips and args.transform_clips
        assert args.train and args.distill and args.overwrite
        assert args.resume == "proj"

    def test_server_flags(self):
        p = cli._build_parser()
        args = p.parse_args(["--model", "m.nww", "--pipeline", "full",
                             "--port", "9000", "--api-key", "k1",
                             "--api-key", "k2", "--rate-limit", "50"])
        assert args.model == "m.nww"
        assert args.pipeline == "full"
        assert args.api_keys == ["k1", "k2"]

    def test_stage_merge_cli_overrides_config(self):
        stages = cli._get_pipeline_stages_from_config(
            {"generate_clips": True, "train_model": False})
        assert stages["generate_clips"] and not stages["train_model"]

        class A:
            generate_clips = False
            transform_clips = False
            train = True
            distill = False

        merged = cli._merge_config_with_cli_args(stages, A())
        assert merged["generate_clips"]   # from config
        assert merged["train_model"]      # from CLI


class TestInfo:
    def test_info_prints_metadata(self, tmp_path, capsys):
        from nanowakeword_tpu.export.artifact import save_nww
        from nanowakeword_tpu.models.model import Model
        cfg = {"activation_function": "relu", "embedding_dim": 16}
        m = Model(config=cfg, model_name="info_toy", input_shape=(16, 96),
                  model_type="dnn", layer_dim=16, n_blocks=1)
        path = str(tmp_path / "info_toy.nww")
        save_nww(path, model=m, config=cfg, model_name="info_toy")
        cli._run_info(path)
        out = capsys.readouterr().out
        assert "info_toy" in out
        assert "dnn" in out
        assert "16, 96" in out

    def test_info_missing_file_exits(self, tmp_path):
        with pytest.raises(SystemExit):
            cli._run_info(str(tmp_path / "missing.nww"))

    def test_info_reads_exported_onnx(self, tmp_path, capsys):
        """--info works on .onnx exports (the reference's --info target),
        via the bundled parser — no onnxruntime required."""
        from nanowakeword_tpu.export.onnx_export import export_onnx
        from nanowakeword_tpu.models.model import Model
        cfg = {"activation_function": "relu", "embedding_dim": 16}
        m = Model(config=cfg, model_name="info_onnx", input_shape=(16, 96),
                  model_type="dnn", layer_dim=16, n_blocks=1)
        path = export_onnx(m, str(tmp_path / "info_onnx.onnx"))
        cli._run_info(path)
        out = capsys.readouterr().out
        assert "ONNX (opset 17" in out
        assert "features" in out and "score" in out
        assert "Gemm" in out

    def test_info_reads_int8_onnx(self, tmp_path, capsys):
        """Quantized exports report their storage and a correct param
        count (int8 kernels counted, DequantizeLinear scales excluded)."""
        from nanowakeword_tpu.export.onnx_export import export_onnx
        from nanowakeword_tpu.models.model import Model
        cfg = {"activation_function": "relu", "embedding_dim": 16}
        m = Model(config=cfg, model_name="info_q", input_shape=(16, 96),
                  model_type="dnn", layer_dim=16, n_blocks=1)
        p32 = export_onnx(m, str(tmp_path / "f.onnx"))
        cli._run_info(p32)
        params_f32 = [l for l in capsys.readouterr().out.splitlines()
                      if "Parameters" in l][0]
        p8 = export_onnx(m, str(tmp_path / "q.onnx"), weights_dtype="int8")
        cli._run_info(p8)
        out = capsys.readouterr().out
        assert "weight-only int8" in out
        params_int8 = [l for l in out.splitlines() if "Parameters" in l][0]
        assert params_int8.split()[-1] == params_f32.split()[-1]


class TestMainRouting:
    def test_no_args_prints_help_and_exits(self, monkeypatch, capsys):
        monkeypatch.setattr(sys, "argv", ["nanowakeword-tpu"])
        with pytest.raises(SystemExit):
            cli.main()
        assert "Training pipeline" in capsys.readouterr().out

    def test_config_without_stages_errors(self, monkeypatch, tmp_path):
        cfg = tmp_path / "c.yaml"
        cfg.write_text(yaml.safe_dump({"model_name": "x"}))
        monkeypatch.setattr(sys, "argv", ["nanowakeword-tpu", "-c", str(cfg)])
        with pytest.raises(SystemExit):
            cli.main()
