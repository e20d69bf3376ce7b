"""ONNX export: graph round-trip + score parity with the live Flax model.

Verifies VERDICT round-1 missing #3: exported `.onnx` files are real,
parseable ONNX (protobuf round-trip through our reader), and their scores
match the `.nww`/live-model sigmoid probabilities to 1e-5. When onnxruntime
is present (not in CI), the same files are additionally validated through it.
"""

import numpy as np
import pytest

from nanowakeword_tpu.export import onnx_eval
from nanowakeword_tpu.export import onnx_proto as P
from nanowakeword_tpu.export.artifact import export_onnx_model
from nanowakeword_tpu.export.onnx_export import build_onnx, export_onnx
from nanowakeword_tpu.models.model import Model


def _model(model_type="dnn", activation="relu", layer_dim=24, n_blocks=2):
    config = {"activation_function": activation, "embedding_dim": 16}
    return Model(config=config, model_name="onnx_t", input_shape=(16, 96),
                 model_type=model_type, layer_dim=layer_dim,
                 n_blocks=n_blocks, dropout_prob=0.3)


def _score_jax(model, feats):
    logits = np.asarray(model(feats))
    return 1.0 / (1.0 + np.exp(-logits))


def _randomize_batch_stats(model, seed=7):
    """Give BatchNorm layers non-trivial running stats so an exporter that
    mishandles mean/var cannot pass by accident (fresh init is 0/1)."""
    import jax
    variables = dict(model.variables)
    if "batch_stats" not in variables:
        return model
    rng = np.random.default_rng(seed)

    def perturb(leaf):
        a = np.asarray(leaf)
        if a.size == 0:
            return leaf
        return np.abs(rng.normal(0.5, 0.3, a.shape)).astype(a.dtype) + 0.1
    variables["batch_stats"] = jax.tree_util.tree_map(
        perturb, variables["batch_stats"])
    model.load_variables(variables)
    return model


@pytest.mark.parametrize("model_type,activation", [
    ("dnn", "relu"), ("dnn", "gelu"), ("dnn", "silu"),
    ("cnn", "relu"), ("cnn", "gelu"),
    ("tcn", "relu"), ("quartznet", "relu"),
    ("bcresnet", "relu"), ("bcresnet", "silu"),
    # recurrent families: native bidirectional ONNX GRU/LSTM nodes,
    # 2 stacked layers (n_blocks=2)
    ("lstm", "relu"), ("gru", "relu"), ("rnn", "relu"),
    ("crnn", "relu"), ("crnn", "silu"),
    # attention families: MHSA lowered to MatMul/Softmax
    ("transformer", "relu"), ("conformer", "relu"),
    ("e_branchformer", "relu"),
])
def test_score_parity_with_live_model(model_type, activation):
    model = _randomize_batch_stats(_model(model_type, activation))
    data = build_onnx(model)
    feats = np.random.default_rng(0).normal(
        size=(1, 16, 96)).astype(np.float32)
    got = onnx_eval.run(data, {"features": feats})["score"]
    want = _score_jax(model, feats)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_tcn_custom_kernel_and_channels():
    """Non-default TCN geometry (kernel 5, widening channels incl. a
    channel-preserving block with no residual conv) round-trips."""
    config = {"activation_function": "relu", "embedding_dim": 16,
              "tcn_channels": [32, 32, 48], "tcn_kernel_size": 5}
    model = Model(config=config, model_name="onnx_tcn", input_shape=(16, 96),
                  model_type="tcn", layer_dim=24, n_blocks=2,
                  dropout_prob=0.0)
    data = build_onnx(model)
    feats = np.random.default_rng(4).normal(
        size=(1, 16, 96)).astype(np.float32)
    got = onnx_eval.run(data, {"features": feats})["score"]
    np.testing.assert_allclose(got, _score_jax(model, feats), atol=1e-5)


def test_quartznet_custom_config():
    """Multi-rep quartznet_config with a channel change mid-stack."""
    config = {"activation_function": "relu", "embedding_dim": 16,
              "quartznet_config": [[64, 9, 2], [96, 13, 1]]}
    model = Model(config=config, model_name="onnx_qn", input_shape=(16, 96),
                  model_type="quartznet", layer_dim=24, n_blocks=2,
                  dropout_prob=0.0)
    model = _randomize_batch_stats(model)
    data = build_onnx(model)
    feats = np.random.default_rng(5).normal(
        size=(1, 16, 96)).astype(np.float32)
    got = onnx_eval.run(data, {"features": feats})["score"]
    np.testing.assert_allclose(got, _score_jax(model, feats), atol=1e-5)


def test_file_roundtrip_and_structure(tmp_path):
    model = _model("dnn")
    path = export_onnx(model, str(tmp_path / "m.onnx"))
    parsed = P.load_model(path)
    assert parsed.opsets[""] == 17
    assert parsed.producer == "nanowakeword_tpu"
    assert [vi.name for vi in parsed.graph.inputs] == ["features"]
    assert parsed.graph.inputs[0].shape == ["batch_size", 16, 96]
    assert [vi.name for vi in parsed.graph.outputs] == ["score"]
    assert parsed.graph.nodes[-1].op_type == "Sigmoid"
    # graph is connected: every node input is an initializer, the graph
    # input, or a prior node output
    known = set(parsed.graph.initializers) | {"features"}
    for nd in parsed.graph.nodes:
        for i in nd.inputs:
            assert i in known, f"dangling input {i} on {nd.op_type}"
        known.update(nd.outputs)


def test_pipeline_entry_unsupported_type_returns_none(tmp_path, capsys):
    model = _model("dnn")
    model.model_type = "no_such_family"
    out = export_onnx_model(model, (16, 96), {}, "m", str(tmp_path))
    assert out is None


class TestStatefulStreamingGru:
    def _model(self):
        config = {"activation_function": "relu", "embedding_dim": 16}
        return Model(config=config, model_name="sg", input_shape=(16, 96),
                     model_type="streaming_gru", layer_dim=12, n_blocks=2,
                     dropout_prob=0.0)

    def test_carry_threading_matches_live_model(self):
        """Two chunks scored through the stateful ONNX graph (hidden_in ->
        hidden_out threading, the reference's nanointerpreter.py:679-691
        convention) match the live Flax module's explicit carry chain."""
        import jax.numpy as jnp
        model = self._model()
        data = build_onnx(model)
        rng = np.random.default_rng(0)
        f1 = rng.normal(size=(1, 16, 96)).astype(np.float32)
        f2 = rng.normal(size=(1, 16, 96)).astype(np.float32)

        # live chain
        logits1, carry1 = model.module.apply(model.variables,
                                             jnp.asarray(f1), carry=None,
                                             deterministic=True)
        logits2, _ = model.module.apply(model.variables, jnp.asarray(f2),
                                        carry=carry1, deterministic=True)
        want1 = 1 / (1 + np.exp(-np.asarray(logits1).reshape(-1)[0]))
        want2 = 1 / (1 + np.exp(-np.asarray(logits2).reshape(-1)[0]))

        # ONNX chain via the numpy evaluator
        zeros = np.zeros((2, 1, 12), np.float32)
        out1 = onnx_eval.run(data, {"input": f1, "hidden_in": zeros,
                                    "cell_in": zeros})
        np.testing.assert_allclose(float(out1["score"].reshape(-1)[0]),
                                   want1, atol=1e-5)
        out2 = onnx_eval.run(data, {"input": f2,
                                    "hidden_in": out1["hidden_out"],
                                    "cell_in": out1["cell_out"]})
        np.testing.assert_allclose(float(out2["score"].reshape(-1)[0]),
                                   want2, atol=1e-5)
        # hidden_out matches the live carry (layer-stacked [L, 1, H])
        live_h = np.stack([np.asarray(c) for c in carry1], axis=0)
        np.testing.assert_allclose(out1["hidden_out"], live_h, atol=1e-5)

    def test_interpreter_threads_onnx_state(self, tmp_path):
        """NanoInterpreter detects hidden_in on a loaded .onnx model and
        threads the carry across predict() chunks (reference :679-691)."""
        from nanowakeword_tpu.interpreter.nanointerpreter import \
            NanoInterpreter
        model = self._model()
        path = export_onnx(model, str(tmp_path / "sg.onnx"))
        itp = NanoInterpreter.load_model(path)
        assert itp.is_stateful["sg"]
        audio = np.random.default_rng(3).integers(
            -8000, 8000, 32000).astype(np.int16)
        scores = itp.predict_clip(audio)
        assert len(scores) > 0
        # the carry must actually be threaded (non-None after warm-up)
        assert itp.hidden_states["sg"] is not None


def test_crnn_gru_cell_custom_channels():
    """CRNN with the GRU cell and a non-default conv stack round-trips."""
    config = {"activation_function": "relu", "embedding_dim": 16,
              "crnn_cnn_channels": [8, 16], "crnn_rnn_type": "gru"}
    model = Model(config=config, model_name="onnx_crnn",
                  input_shape=(16, 96), model_type="crnn", layer_dim=24,
                  n_blocks=1, dropout_prob=0.0)
    model = _randomize_batch_stats(model)
    data = build_onnx(model)
    feats = np.random.default_rng(6).normal(
        size=(1, 16, 96)).astype(np.float32)
    got = onnx_eval.run(data, {"features": feats})["score"]
    np.testing.assert_allclose(got, _score_jax(model, feats), atol=1e-5)


def test_rnn_matches_onnx_spec_gate_order():
    """The GRU weight repack is validated against an independent
    spec-faithful numpy GRU fed the RAW FastGRU weights (torch gate order):
    if the (r,z,n)->(z,r,n) reorder or bias split were wrong, these would
    diverge on random weights."""
    model = _model("gru", layer_dim=8, n_blocks=1)
    p = model.params["backbone"]["BiRNN_0"]["FastGRU_0"]
    K = np.asarray(p["input_proj"]["kernel"], np.float32)
    bi = np.asarray(p["input_proj"]["bias"], np.float32)
    Rk = np.asarray(p["recurrent_kernel"], np.float32)
    br = np.asarray(p["recurrent_bias"], np.float32)
    H = Rk.shape[0]
    rng = np.random.default_rng(0)
    x = rng.normal(size=(5, 96)).astype(np.float32)

    # direct FastGRU recurrence (models/fast_rnn.py:40-48)
    h = np.zeros(H, np.float32)
    want = []
    for t in range(5):
        xg = x[t] @ K + bi
        hg = h @ Rk + br
        r = 1 / (1 + np.exp(-(xg[:H] + hg[:H])))
        z = 1 / (1 + np.exp(-(xg[H:2 * H] + hg[H:2 * H])))
        n = np.tanh(xg[2 * H:] + r * hg[2 * H:])
        h = (1 - z) * n + z * h
        want.append(h.copy())

    from nanowakeword_tpu.export.onnx_eval import _gru_direction
    from nanowakeword_tpu.export.onnx_export import _pack_gru
    W, R, B, _ = _pack_gru(p)
    got = _gru_direction(x[:, None, :], W, R, B, linear_before_reset=1)
    np.testing.assert_allclose(got[:, 0], np.stack(want), atol=1e-5)


def test_pipeline_entry_writes_file(tmp_path):
    model = _model("cnn")
    out = export_onnx_model(model, (16, 96), model.config, "m",
                            str(tmp_path))
    assert out is not None and out.endswith("m.onnx")
    feats = np.random.default_rng(1).normal(
        size=(1, 16, 96)).astype(np.float32)
    got = onnx_eval.run(out, {"features": feats})["score"]
    np.testing.assert_allclose(got, _score_jax(model, feats), atol=1e-5)


def test_batch_of_one_bounds():
    """Scores stay in (0,1) and vary with input."""
    model = _model("dnn")
    data = build_onnx(model)
    rng = np.random.default_rng(2)
    scores = [onnx_eval.run(data, {"features": rng.normal(
        size=(1, 16, 96)).astype(np.float32)})["score"][0, 0]
        for _ in range(4)]
    assert all(0.0 < s < 1.0 for s in scores)
    assert len({round(float(s), 6) for s in scores}) > 1


class TestInt8Export:
    """Weight-only int8 graphs: int8 initializers + DequantizeLinear."""

    @pytest.mark.parametrize("model_type", ["dnn", "cnn", "crnn",
                                            "conformer"])
    def test_int8_score_parity(self, model_type):
        model = _randomize_batch_stats(_model(model_type))
        data = build_onnx(model, weights_dtype="int8")
        feats = np.random.default_rng(1).normal(
            size=(2, 16, 96)).astype(np.float32)
        got = onnx_eval.run(data, {"features": feats})["score"]
        want = _score_jax(model, feats)
        # per-channel int8 weight noise only
        np.testing.assert_allclose(got, want, atol=0.02)
        # and the graph really is quantized
        m = P.load_model(data)
        q = [a for a in m.graph.initializers.values()
             if np.asarray(a).dtype == np.int8]
        assert q, "no int8 initializers in the quantized graph"
        assert any(nd.op_type == "DequantizeLinear" for nd in m.graph.nodes)

    def test_int8_shrinks_file(self, tmp_path):
        model = _model("dnn", layer_dim=64, n_blocks=2)
        p32 = export_onnx(model, str(tmp_path / "f32.onnx"))
        p8 = export_onnx(model, str(tmp_path / "i8.onnx"),
                         weights_dtype="int8")
        import os
        assert os.path.getsize(p8) < 0.45 * os.path.getsize(p32)

    def test_int8_runs_on_jax_runtime(self, tmp_path):
        from nanowakeword_tpu.export.onnx_jax import make_jax_fn
        model = _model("dnn")
        path = export_onnx(model, str(tmp_path / "q.onnx"),
                           weights_dtype="int8")
        fn, _ = make_jax_fn(path)
        feats = np.random.default_rng(2).normal(
            size=(1, 16, 96)).astype(np.float32)
        got = np.asarray(fn({"features": feats})["score"])
        np.testing.assert_allclose(got, _score_jax(model, feats), atol=0.02)

    def test_int8_stateful_streaming_gru(self):
        model = _model("streaming_gru", layer_dim=24, n_blocks=1)
        data = build_onnx(model, weights_dtype="int8")
        m = P.load_model(data)
        assert any(np.asarray(a).dtype == np.int8
                   for a in m.graph.initializers.values())

    def test_rejects_unknown_dtype(self, tmp_path):
        with pytest.raises(ValueError, match="weights_dtype"):
            export_onnx(_model("dnn"), str(tmp_path / "x.onnx"),
                        weights_dtype="int4")

    def test_int8_onnxruntime_if_available(self, tmp_path):
        ort = pytest.importorskip("onnxruntime")
        model = _model("dnn")
        path = export_onnx(model, str(tmp_path / "q.onnx"),
                           weights_dtype="int8")
        sess = ort.InferenceSession(path)
        feats = np.random.default_rng(3).normal(
            size=(1, 16, 96)).astype(np.float32)
        got = sess.run(["score"], {"features": feats})[0]
        np.testing.assert_allclose(got, _score_jax(model, feats), atol=0.02)


def test_onnxruntime_if_available(tmp_path):
    ort = pytest.importorskip("onnxruntime")
    model = _model("dnn", "gelu")
    path = export_onnx(model, str(tmp_path / "m.onnx"))
    sess = ort.InferenceSession(path)
    feats = np.random.default_rng(3).normal(
        size=(1, 16, 96)).astype(np.float32)
    got = sess.run(["score"], {"features": feats})[0]
    np.testing.assert_allclose(got, _score_jax(model, feats), atol=1e-5)


@pytest.mark.parametrize("model_type", [
    "dnn", "cnn", "tcn", "quartznet", "bcresnet", "gru", "crnn",
    "transformer", "conformer", "e_branchformer"])
def test_dynamic_batch_scores_match_per_row(model_type):
    """EVERY family declares a dynamic batch axis (the reference's
    torch.onnx.export contract, _export/onnx.py:74-82): a batch-5 run
    equals five batch-1 runs. Attention families included — their per-head
    lowering keeps batch symbolic (VERDICT r2 missing #2)."""
    model = _randomize_batch_stats(_model(model_type))
    data = build_onnx(model)
    parsed = P.load_model(data)
    assert parsed.graph.inputs[0].shape[0] == "batch_size"
    feats = np.random.default_rng(8).normal(
        size=(5, 16, 96)).astype(np.float32)
    batched = onnx_eval.run(data, {"features": feats})["score"]
    assert batched.shape[0] == 5
    for i in range(5):
        single = onnx_eval.run(data, {"features": feats[i:i + 1]})["score"]
        np.testing.assert_allclose(batched[i], single[0], atol=1e-5)
    # the jax runtime batches too
    from nanowakeword_tpu.export.onnx_jax import OnnxJaxModel
    got = OnnxJaxModel(data)(feats)
    np.testing.assert_allclose(got, batched, atol=1e-5)


CUSTOM_SRC = """
import flax.linen as nn
import jax.numpy as jnp

class MyNet(nn.Module):
    embedding_dim: int
    dropout_prob: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic=True):
        h = nn.Dense(24)(x)                             # [B, T, 24]
        h = nn.LayerNorm()(h)
        h = nn.gelu(h)
        a = nn.softmax(h @ jnp.swapaxes(h, 1, 2) / 5.0, axis=-1)
        h = a @ h                                       # self-attention-ish
        h = h.mean(axis=1)                              # [B, 24]
        return nn.tanh(nn.Dense(self.embedding_dim)(h))
"""


def _custom_model(tmp_path):
    src = tmp_path / "my_arch.py"
    src.write_text(CUSTOM_SRC)
    cfg = {"activation_function": "relu", "embedding_dim": 16,
           "custom_model_config": {"module_path": str(src),
                                   "class_name": "MyNet"}}
    return Model(config=cfg, model_name="custom_onnx", input_shape=(16, 96),
                 model_type="custom", layer_dim=16, n_blocks=1,
                 dropout_prob=0.2)


class TestCustomModuleExport:
    """User `custom` modules export via jaxpr lowering — the reference
    exports ANY nn.Module through torch.onnx.export (_export/onnx.py:26-88);
    VERDICT r2 missing #2."""

    def test_custom_module_exports_with_dynamic_batch(self, tmp_path):
        model = _custom_model(tmp_path)
        data = build_onnx(model)
        parsed = P.load_model(data)
        assert parsed.graph.inputs[0].shape[0] == "batch_size"

        feats = np.random.default_rng(4).normal(
            size=(5, 16, 96)).astype(np.float32)
        batched = onnx_eval.run(data, {"features": feats})["score"]
        want = _score_jax(model, feats)
        np.testing.assert_allclose(batched, want, atol=1e-5)
        for i in range(3):
            single = onnx_eval.run(
                data, {"features": feats[i:i + 1]})["score"]
            np.testing.assert_allclose(batched[i], single[0], atol=1e-5)

    def test_custom_module_runs_on_the_jax_runtime(self, tmp_path):
        model = _custom_model(tmp_path)
        data = build_onnx(model)
        from nanowakeword_tpu.export.onnx_jax import OnnxJaxModel
        feats = np.random.default_rng(5).normal(
            size=(3, 16, 96)).astype(np.float32)
        got = OnnxJaxModel(data)(feats)
        np.testing.assert_allclose(got, _score_jax(model, feats), atol=1e-5)

    def test_unsupported_primitive_raises_cleanly(self, tmp_path):
        src = tmp_path / "weird.py"
        src.write_text(
            "import flax.linen as nn\nimport jax.numpy as jnp\n"
            "class Weird(nn.Module):\n"
            "    embedding_dim: int\n"
            "    @nn.compact\n"
            "    def __call__(self, x, deterministic=True):\n"
            "        x = jnp.sort(x, axis=-1)\n"   # sort: no ONNX lowering
            "        return nn.Dense(self.embedding_dim)("
            "x.reshape(x.shape[0], -1))\n")
        cfg = {"activation_function": "relu", "embedding_dim": 8,
               "custom_model_config": {"module_path": str(src),
                                       "class_name": "Weird"}}
        model = Model(config=cfg, model_name="weird", input_shape=(4, 8),
                      model_type="custom", layer_dim=8, n_blocks=1)
        from nanowakeword_tpu.export.jaxpr_onnx import ExportUnsupported
        with pytest.raises((ExportUnsupported, NotImplementedError)):
            build_onnx(model)
