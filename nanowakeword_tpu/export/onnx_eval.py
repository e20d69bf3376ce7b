"""Reference numpy evaluator for exported ONNX graphs.

Executes the ops emitted by onnx_export.py (Gemm, Conv, MaxPool,
LayerNormalization, activations, shape ops) directly with numpy. Purpose:
hermetic verification that an exported `.onnx` file scores identically to
the live Flax model (tests/test_onnx_export.py) in environments without
onnxruntime — and a last-resort CPU scorer for exported artifacts.

This is a correctness tool, not a serving path; the serving paths are the
jitted interpreter (interpreter/nanointerpreter.py) and the `.nww` artifact.
"""

from __future__ import annotations

from typing import Dict, Union

import numpy as np

from nanowakeword_tpu.export import onnx_proto as P


def _conv2d(x, w, b, pads, strides):
    """x [N,C,H,W], w [O,C,kH,kW] -> [N,O,H',W']."""
    n, c, h, wd = x.shape
    o, _, kh, kw = w.shape
    pt, pl, pb, pr = pads
    sh, sw = strides
    xp = np.pad(x, ((0, 0), (0, 0), (pt, pb), (pl, pr)))
    oh = (h + pt + pb - kh) // sh + 1
    ow = (wd + pl + pr - kw) // sw + 1
    # im2col: [N, C*kH*kW, oh*ow]
    cols = np.empty((n, c * kh * kw, oh * ow), x.dtype)
    idx = 0
    for i in range(kh):
        for j in range(kw):
            patch = xp[:, :, i:i + oh * sh:sh, j:j + ow * sw:sw]
            cols[:, idx * c:(idx + 1) * c] = patch.reshape(n, c, -1)
            idx += 1
    # weights to match col layout [(kh*kw)*c, O]
    wmat = w.transpose(2, 3, 1, 0).reshape(kh * kw * c, o)
    out = np.einsum("nkp,ko->nop", cols, wmat, optimize=True)
    if b is not None:
        out += b[None, :, None]
    return out.reshape(n, o, oh, ow)


def _maxpool2d(x, kernel, strides):
    n, c, h, w = x.shape
    kh, kw = kernel
    sh, sw = strides
    oh = (h - kh) // sh + 1
    ow = (w - kw) // sw + 1
    out = np.full((n, c, oh, ow), -np.inf, x.dtype)
    for i in range(kh):
        for j in range(kw):
            out = np.maximum(
                out, x[:, :, i:i + oh * sh:sh, j:j + ow * sw:sw])
    return out


def run(model: Union[str, bytes, P.ParsedModel],
        inputs: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Execute the graph; returns {output_name: array}."""
    if not isinstance(model, P.ParsedModel):
        model = P.load_model(model)
    g = model.graph
    env: Dict[str, np.ndarray] = dict(g.initializers)
    for vi in g.inputs:
        if vi.name not in inputs:
            raise KeyError(f"missing graph input '{vi.name}'")
        env[vi.name] = np.asarray(inputs[vi.name], np.float32)

    for nd in g.nodes:
        a = nd.attrs
        x = [env[i] for i in nd.inputs if i]
        op = nd.op_type
        if op == "Gemm":
            A, B = x[0], x[1]
            if a.get("transA", 0):
                A = A.T
            if a.get("transB", 0):
                B = B.T
            y = a.get("alpha", 1.0) * (A @ B)
            if len(x) > 2:
                y = y + a.get("beta", 1.0) * x[2]
        elif op == "Relu":
            y = np.maximum(x[0], 0)
        elif op == "Sigmoid":
            y = 1.0 / (1.0 + np.exp(-x[0]))
        elif op == "Tanh":
            y = np.tanh(x[0])
        elif op == "Add":
            y = x[0] + x[1]
        elif op == "Sub":
            y = x[0] - x[1]
        elif op == "Mul":
            y = x[0] * x[1]
        elif op == "Div":
            y = x[0] / x[1]
        elif op == "Flatten":
            axis = a.get("axis", 1)
            shape = x[0].shape
            y = x[0].reshape(int(np.prod(shape[:axis] or (1,))), -1)
        elif op == "Reshape":
            y = x[0].reshape([int(d) for d in x[1]])
        elif op == "Transpose":
            y = np.transpose(x[0], a["perm"])
        elif op == "LayerNormalization":
            axis = a.get("axis", -1)
            eps = a.get("epsilon", 1e-5)
            mean = x[0].mean(axis=axis, keepdims=True)
            var = x[0].var(axis=axis, keepdims=True)
            y = (x[0] - mean) / np.sqrt(var + eps)
            y = y * x[1] + (x[2] if len(x) > 2 else 0.0)
        elif op == "Conv":
            y = _conv2d(x[0], x[1], x[2] if len(x) > 2 else None,
                        a.get("pads", [0, 0, 0, 0]),
                        a.get("strides", [1, 1]))
        elif op == "MaxPool":
            y = _maxpool2d(x[0], a["kernel_shape"],
                           a.get("strides", a["kernel_shape"]))
        else:
            raise NotImplementedError(f"op '{op}' not supported by the "
                                      "built-in ONNX evaluator")
        env[nd.outputs[0]] = np.asarray(y, np.float32)

    return {vi.name: env[vi.name] for vi in g.outputs}
