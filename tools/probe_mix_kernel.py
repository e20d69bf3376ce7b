"""Same-session A/B of the augmentation pre-stage: fused Pallas mix kernel
vs the vmapped XLA chain (VERDICT r4 weak #1 — the kernel became the
default TPU path with 'TODO ms' in its docstring and no measurement).

Measures, at 2048 x 16000 int16 on the real chip, steady-state (chained
fori_loop iterations per scalar fetch, fresh fold_in key per iteration):

  1. pre-stage standalone: vmap(_augment_pre) [XLA] vs _augment_pre_fused
     [Pallas kernel]
  2. FULL config-3 training step (bf16) with the kernel default on vs
     forced off (NWW_TPU_PALLAS_MIX)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_mix_kernel.py

Measured (v5e-1, 16 chained steps/sync, round 5 — two sessions):

    pre-stage XLA chain      2.88 / 2.95 ms/step
    pre-stage Pallas kernel  3.01 / 3.01 ms/step   (~2% LOSS)
    config-3 bf16, kernel   11.09 / 11.05 ms/step = 184.7/185.4k clips/s
    config-3 bf16, XLA mix  11.15 / 11.09 ms/step = 183.7/184.7k clips/s

VERDICT: measured negative — the kernel loses standalone and washes in
the full step, so its default flipped OFF (ops/mix_pallas.py). The
committed round-4 headline (11.79 ms = 173.7k, XLA path) reproduces here
at 11.09-11.15 ms (relay session variance).
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from nanowakeword_tpu.data.features import (EMB_OFFSET,
                                            default_encoder_variables)
from nanowakeword_tpu.models.embedding import (build_encoder,
                                               infer_encoder_arch)
from nanowakeword_tpu.models.model import Model
from nanowakeword_tpu.ops.augment import (AugmentParams, _augment_pre,
                                          _augment_pre_fused, augment_batch,
                                          spec_augment)
from nanowakeword_tpu.ops.mel_pallas import mel_frontend_fused
from nanowakeword_tpu.train.optim import build_optimizer
from nanowakeword_tpu.train.step import create_train_state, make_train_step

BATCH = 2048
N_STEPS = 16


def timed_chain(name, body, carry_init, args):
    """Chain N_STEPS body calls per scalar fetch; report the 2nd run."""
    @jax.jit
    def chain(carry, *a):
        def f(i, c):
            return body(i, c, *a)
        out = jax.lax.fori_loop(0, N_STEPS, f, carry)
        leaves = [x.reshape(-1)[0].astype(jnp.float32)
                  for x in jax.tree_util.tree_leaves(out)]
        return jnp.sum(jnp.stack(leaves))

    float(chain(carry_init, *args))  # compile + warm
    t0 = time.perf_counter()
    float(chain(carry_init, *args))
    dt = (time.perf_counter() - t0) / N_STEPS
    print(f"{name:>28}: {dt * 1e3:8.2f} ms/step   "
          f"{BATCH / dt:12,.0f} clips/s", flush=True)
    return dt


def key_of(i):
    return jax.random.fold_in(jax.random.PRNGKey(0), i)


def main():
    rng = np.random.default_rng(0)
    audio = jax.device_put(np.asarray(
        rng.integers(-16000, 16000, (BATCH, 16000)), np.int16))
    bg = jax.device_put(np.asarray(
        rng.integers(-2000, 2000, (BATCH, 16000)), np.float32) / 32768.0)
    rirs = jax.device_put(np.zeros((BATCH, 1600), np.float32))
    fg_lens = jax.device_put(np.full(BATCH, 16000, np.int32))
    flags = jax.device_put(np.ones(BATCH, bool))
    no_flags = jax.device_put(np.zeros(BATCH, bool))
    labels = jax.device_put(np.asarray(rng.random(BATCH) < 0.5, np.float32))

    params = AugmentParams.from_settings({"rir_prob": 0.0})

    # --- 1. pre-stage standalone ---
    def pre_xla(i, acc, a, b, fl, hb):
        keys = jax.random.split(key_of(i), BATCH)
        fg = a.astype(jnp.float32) * (1.0 / 32768.0)
        out = jax.vmap(_augment_pre, in_axes=(0, 0, 0, 0, 0, None))(
            keys, fg, b, fl, hb, params)
        return acc + out[0, 0]
    timed_chain("pre-stage XLA chain", pre_xla, jnp.float32(0.0),
                (audio, bg, fg_lens, flags))

    def pre_kernel(i, acc, a, b, fl, hb):
        keys = jax.random.split(key_of(i), BATCH)
        out = _augment_pre_fused(keys, a, b, fl, hb, params)
        return acc + out[0, 0]
    timed_chain("pre-stage Pallas kernel", pre_kernel, jnp.float32(0.0),
                (audio, bg, fg_lens, flags))

    # --- 2. full config-3 step, kernel on vs off ---
    base = {"activation_function": "relu", "embedding_dim": 64,
            "crnn_cnn_channels": [16, 32, 32], "crnn_rnn_type": "gru"}
    crnn = Model(config=dict(base), model_name="p_crnn",
                 input_shape=(16, 96), model_type="crnn", layer_dim=64,
                 n_blocks=2, dropout_prob=0.0)
    _enc_host = default_encoder_variables()
    encoder = build_encoder(infer_encoder_arch(_enc_host),
                            dtype=jnp.bfloat16, precision=None)
    enc_vars = jax.device_put(_enc_host)
    tx = build_optimizer({"optimizer_type": "adamw",
                          "learning_rate_max": 1e-3,
                          "lr_scheduler_type": "onecycle"}, 1000)
    state = jax.device_put(create_train_state(crnn.module, crnn.variables,
                                              tx))
    compute_dtype = "float32" if "--f32" in sys.argv else "bfloat16"
    print(f"train-step compute_dtype: {compute_dtype}")
    step = make_train_step(crnn.module, tx, donate=False, jit=False,
                           compute_dtype=compute_dtype)

    def full_body(i, carry, ev, a, b, r, fl, hb, hr, y):
        st, _ = carry
        k = key_of(i)
        aug = augment_batch(k, a, b, r, fl, hb, hr, params)
        mel = mel_frontend_fused(aug, out_dtype=jnp.bfloat16)
        mel = spec_augment(k, mel)
        emb = encoder.apply(ev, mel[:, EMB_OFFSET:])
        f = jnp.pad(emb, ((0, 0), (16 - emb.shape[1], 0), (0, 0)))
        new_state, metrics = step(st, f, y)
        return new_state, metrics.loss

    # env gate is read at trace time; flip it between the two jits
    os.environ["NWW_TPU_PALLAS_MIX"] = "1"
    timed_chain("config-3 (kernel mix)", full_body,
                (state, jnp.float32(0.0)),
                (enc_vars, audio, bg, rirs, fg_lens, flags, no_flags,
                 labels))
    os.environ["NWW_TPU_PALLAS_MIX"] = "0"
    timed_chain("config-3 (XLA mix)", full_body,
                (state, jnp.float32(0.0)),
                (enc_vars, audio, bg, rirs, fg_lens, flags, no_flags,
                 labels))
    os.environ["NWW_TPU_PALLAS_MIX"] = "1"


if __name__ == "__main__":
    main()
