"""Fast{GRU,LSTM} vs torch.nn.{GRU,LSTM}: the zoo's recurrent layers claim
torch gate conventions (models/fast_rnn.py:10-12 — the reference's
architectures are torch nn.GRU/nn.LSTM, reference architectures.py:82-160).
These tests load IDENTICAL weights into both implementations and require
the outputs to agree, so a gate-order or bias-placement drift cannot pass.
The same packing underwrites the ONNX GRU/LSTM export (onnx_export.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from nanowakeword_tpu.models.fast_rnn import FastGRU, FastLSTM  # noqa: E402

B, T, F, H = 3, 7, 5, 4


def _data(seed=0):
    return np.random.default_rng(seed).normal(size=(B, T, F)).astype(
        np.float32)


def _np(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


class TestGRU:
    def test_matches_torch_gru(self):
        layer = FastGRU(hidden=H)
        x = _data()
        variables = layer.init(jax.random.PRNGKey(3), jnp.asarray(x))
        p = _np(variables)["params"]

        ref = torch.nn.GRU(F, H, batch_first=True)
        with torch.no_grad():
            ref.weight_ih_l0.copy_(
                torch.from_numpy(p["input_proj"]["kernel"].T.copy()))
            ref.bias_ih_l0.copy_(
                torch.from_numpy(p["input_proj"]["bias"].copy()))
            ref.weight_hh_l0.copy_(
                torch.from_numpy(p["recurrent_kernel"].T.copy()))
            ref.bias_hh_l0.copy_(
                torch.from_numpy(p["recurrent_bias"].copy()))
            want, _ = ref(torch.from_numpy(x))

        got = np.asarray(layer.apply(variables, jnp.asarray(x)))
        np.testing.assert_allclose(got, want.numpy(), atol=1e-5)

    def test_reverse_matches_torch_flip(self):
        layer = FastGRU(hidden=H, reverse=True)
        x = _data(1)
        variables = layer.init(jax.random.PRNGKey(4), jnp.asarray(x))
        p = _np(variables)["params"]

        ref = torch.nn.GRU(F, H, batch_first=True)
        with torch.no_grad():
            ref.weight_ih_l0.copy_(
                torch.from_numpy(p["input_proj"]["kernel"].T.copy()))
            ref.bias_ih_l0.copy_(
                torch.from_numpy(p["input_proj"]["bias"].copy()))
            ref.weight_hh_l0.copy_(
                torch.from_numpy(p["recurrent_kernel"].T.copy()))
            ref.bias_hh_l0.copy_(
                torch.from_numpy(p["recurrent_bias"].copy()))
            flipped, _ = ref(torch.from_numpy(x[:, ::-1].copy()))
        want = flipped.numpy()[:, ::-1]

        got = np.asarray(layer.apply(variables, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestLSTM:
    def test_matches_torch_lstm(self):
        layer = FastLSTM(hidden=H)
        x = _data(2)
        variables = layer.init(jax.random.PRNGKey(5), jnp.asarray(x))
        p = _np(variables)["params"]

        ref = torch.nn.LSTM(F, H, batch_first=True)
        with torch.no_grad():
            ref.weight_ih_l0.copy_(
                torch.from_numpy(p["input_proj"]["kernel"].T.copy()))
            ref.bias_ih_l0.copy_(
                torch.from_numpy(p["input_proj"]["bias"].copy()))
            ref.weight_hh_l0.copy_(
                torch.from_numpy(p["recurrent_kernel"].T.copy()))
            ref.bias_hh_l0.copy_(
                torch.from_numpy(p["recurrent_bias"].copy()))
            want, _ = ref(torch.from_numpy(x))

        got = np.asarray(layer.apply(variables, jnp.asarray(x)))
        np.testing.assert_allclose(got, want.numpy(), atol=1e-5)
