"""Flax wake-word models -> ONNX graphs.

Parity target: `/root/reference/nanowakeword/_export/onnx.py:26-88` — the
reference's deployable interchange format (`model.onnx`, produced by
torch.onnx.export with a fixed [1, T, 96] input and a sigmoid score output).

This exporter builds the ONNX graph directly from the Flax parameter tree
(no torch, no onnx package — serialisation is onnx_proto.py). Supported
families: the feed-forward backbones — "dnn" (Gemm/LayerNormalization
stacks) and "cnn" (Conv/MaxPool) — plus the shared WakeWordModule head;
these cover the default pipeline's distilled "lite"/gate students and the
dnn/cnn zoo entries. Recurrent/attention families deploy via `.nww`
(export/artifact.py), which streams through the jitted runtime instead.

Graph contract (matches the reference's exported model):
  input  "features" : float32 [1, T, 96]
  output "score"    : float32 [1, n_classes]   (sigmoid probability)

Numerical notes: flax Dense kernels are [in, out] and feed Gemm with
transB=0; flax Conv kernels are [kH, kW, in, out] (NHWC) and are transposed
to ONNX's [out, in, kH, kW] with explicit NCHW<->NHWC transposes at the
boundaries so flattening order matches the Flax reshape semantics. GELU is
emitted as the tanh approximation (what flax nn.gelu computes); exported
scores match the live model to ~1e-6 (tests/test_onnx_export.py).
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from nanowakeword_tpu.export import onnx_proto as P
from nanowakeword_tpu.utils.logger import print_error, print_info

SUPPORTED_TYPES = ("dnn", "cnn")


class _GraphBuilder:
    """Accumulates nodes/initializers and hands out unique tensor names."""

    def __init__(self):
        self.nodes: List[bytes] = []
        self.inits: List[bytes] = []
        self._n = 0

    def name(self, hint: str) -> str:
        self._n += 1
        return f"{hint}_{self._n}"

    def init_tensor(self, hint: str, array) -> str:
        name = self.name(hint)
        self.inits.append(P.tensor(name, np.asarray(array)))
        return name

    def add(self, op: str, inputs, n_out: int = 1, **attrs) -> str:
        outs = [self.name(op.lower()) for _ in range(n_out)]
        self.nodes.append(P.node(op, inputs, outs,
                                 name=self.name(f"n_{op.lower()}"), **attrs))
        return outs[0] if n_out == 1 else outs

    # -- composite helpers -------------------------------------------------------

    def gemm(self, x: str, kernel: np.ndarray, bias: np.ndarray,
             hint: str) -> str:
        w = self.init_tensor(f"{hint}_w", kernel)          # [in, out]
        b = self.init_tensor(f"{hint}_b", bias)
        return self.add("Gemm", [x, w, b])

    def layer_norm(self, x: str, scale: np.ndarray, bias: np.ndarray,
                   hint: str) -> str:
        s = self.init_tensor(f"{hint}_scale", scale)
        b = self.init_tensor(f"{hint}_bias", bias)
        return self.add("LayerNormalization", [x, s, b],
                        axis=-1, epsilon=1e-6)             # flax default eps

    def activation(self, x: str, kind: str) -> str:
        kind = (kind or "relu").lower()
        if kind == "relu":
            return self.add("Relu", [x])
        if kind == "silu":
            return self.add("Mul", [x, self.add("Sigmoid", [x])])
        if kind == "gelu":
            # tanh approximation — identical to flax nn.gelu(approximate=True)
            c0 = self.init_tensor("c_sqrt2opi", np.float32(0.7978845608028654))
            c1 = self.init_tensor("c_044715", np.float32(0.044715))
            half = self.init_tensor("c_half", np.float32(0.5))
            one = self.init_tensor("c_one", np.float32(1.0))
            x3 = self.add("Mul", [x, self.add("Mul", [x, x])])
            inner = self.add("Mul", [
                c0, self.add("Add", [x, self.add("Mul", [c1, x3])])])
            t = self.add("Tanh", [inner])
            return self.add("Mul", [
                self.add("Mul", [half, x]), self.add("Add", [one, t])])
        raise ValueError(f"unsupported activation '{kind}' for ONNX export")


def _dnn_backbone(g: _GraphBuilder, x: str, params: dict,
                  activation: str) -> str:
    """DNNModel (models/architectures.py:117-131): flatten -> n+1 blocks of
    Dense+LayerNorm+act (dropout is identity at inference) -> Dense."""
    x = g.add("Flatten", [x], axis=1)
    n_dense = len([k for k in params if k.startswith("Dense_")])
    for i in range(n_dense - 1):
        d = params[f"Dense_{i}"]
        x = g.gemm(x, d["kernel"], d["bias"], f"bb_dense{i}")
        ln = params[f"LayerNorm_{i}"]
        x = g.layer_norm(x, ln["scale"], ln["bias"], f"bb_ln{i}")
        x = g.activation(x, activation)
    d = params[f"Dense_{n_dense - 1}"]
    return g.gemm(x, d["kernel"], d["bias"], "bb_out")


def _conv_same(g: _GraphBuilder, x: str, kernel: np.ndarray,
               bias: np.ndarray, hint: str) -> str:
    """flax nn.Conv(ch, (3,3), SAME) on NCHW input."""
    kh, kw = kernel.shape[0], kernel.shape[1]
    w = g.init_tensor(f"{hint}_w", np.transpose(kernel, (3, 2, 0, 1)))
    b = g.init_tensor(f"{hint}_b", bias)
    return g.add("Conv", [x, w, b], kernel_shape=[kh, kw],
                 pads=[(kh - 1) // 2, (kw - 1) // 2, kh // 2, kw // 2],
                 strides=[1, 1])


def _cnn_backbone(g: _GraphBuilder, x: str, params: dict, activation: str,
                  input_shape) -> str:
    """CNNModel (models/architectures.py:138-153). The NHWC->NCHW transpose
    pair around the conv stack keeps ONNX's flatten order identical to the
    Flax [B, T, F, C] reshape."""
    t, f = int(input_shape[0]), int(input_shape[1])
    # [1, T, F] -> [1, 1, T, F] (NCHW with C=1)
    shape4 = g.init_tensor("shape4", np.asarray([1, 1, t, f], np.int64))
    x = g.add("Reshape", [x, shape4])
    x = _conv_same(g, x, params["Conv_0"]["kernel"],
                   params["Conv_0"]["bias"], "bb_conv0")
    x = g.activation(x, activation)
    x = g.add("MaxPool", [x], kernel_shape=[2, 2], strides=[2, 2])
    x = _conv_same(g, x, params["Conv_1"]["kernel"],
                   params["Conv_1"]["bias"], "bb_conv1")
    x = g.activation(x, activation)
    x = g.add("MaxPool", [x], kernel_shape=[2, 2], strides=[2, 2])
    x = g.add("Transpose", [x], perm=[0, 2, 3, 1])     # NCHW -> NHWC
    x = g.add("Flatten", [x], axis=1)
    d0 = params["Dense_0"]
    x = g.gemm(x, d0["kernel"], d0["bias"], "bb_dense0")
    x = g.activation(x, activation)
    d1 = params["Dense_1"]
    return g.gemm(x, d1["kernel"], d1["bias"], "bb_out")


def build_onnx(model, input_shape=None) -> bytes:
    """A Model (models/model.py) -> serialized ONNX ModelProto bytes."""
    model_type = model.model_type
    if model_type not in SUPPORTED_TYPES:
        raise ValueError(
            f"ONNX export supports {SUPPORTED_TYPES}; '{model_type}' models "
            "deploy via the .nww artifact (recurrent/attention control flow "
            "is served by the jitted runtime, not an ONNX graph).")
    input_shape = tuple(input_shape or model.input_shape)
    activation = str(model.config.get("activation_function", "relu"))
    params = {k: jax_to_np(v) for k, v in model.params.items()}

    g = _GraphBuilder()
    x = "features"
    if model_type == "dnn":
        emb = _dnn_backbone(g, x, params["backbone"], activation)
    else:
        emb = _cnn_backbone(g, x, params["backbone"], activation,
                            input_shape)

    # shared head (models/model.py:152-175): Dense -> act -> Dense -> sigmoid
    h = g.gemm(emb, params["Dense_0"]["kernel"], params["Dense_0"]["bias"],
               "head0")
    h = g.activation(h, activation)
    logits = g.gemm(h, params["Dense_1"]["kernel"], params["Dense_1"]["bias"],
                    "head1")
    g.nodes.append(P.node("Sigmoid", [logits], ["score"], name="n_sigmoid"))

    graph = P.graph(
        g.nodes, name=f"{model.model_name}_{model_type}",
        inputs=[P.value_info("features", (1,) + input_shape)],
        outputs=[P.value_info("score", (1, model.n_classes))],
        initializers=g.inits,
        doc=f"nanowakeword_tpu {model_type} wake-word scorer")
    return P.model(graph, opset=17,
                   doc="exported by nanowakeword_tpu.export.onnx_export")


def jax_to_np(tree):
    import jax
    return jax.tree_util.tree_map(lambda a: np.asarray(a, np.float32), tree)


def export_onnx(model, path: str, input_shape=None) -> str:
    data = build_onnx(model, input_shape=input_shape)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)
    print_info(f"ONNX model written to '{path}' "
               f"({len(data) / 1024:.0f} KiB, opset 17)")
    return path
