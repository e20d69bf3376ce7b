"""Stage-stripping decomposition of the config-3 training step.

Config 3 (BASELINE.md) = CRNN training with full augmentation (noise mix +
SpecAugment). bench.py measures the whole chained step; this tool times
cumulative prefixes of that exact chain, steady-state (N chained fori_loop
iterations per value fetch, fresh fold_in key per iteration so nothing is
loop-invariant), to attribute the per-step cost.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_config3.py
       (add --bf16 for the compute_dtype=bfloat16 train-step variant; the
       augmentation/mel stages are dtype-independent)

Round-4 measurements (batch 2048 x 16000, 16 chained steps/sync, v5e-1,
--bf16), after rational-interleaved pitch + the producer barrier landed:

    augment (default=rational)   6.9 ms/step   (grouped 8.2, continuous
                                                11.6, pitch off 4.8)
    augment+mel                  7.5 ms
    augment+mel+spec+encoder     8.0 ms
    train step only (feats)      5.2 ms bf16
    FULL config-3 step          11.79 ms bf16 = 173.7k clips/s
                                (grouped pitch same session: 14.97 = 136.8k;
                                 round-3 record: 19.4 = 106.9k)

Round-3 milestones for context: 31 ms -> 22.3/19.4 (one-hot mix shift,
blk=16 spans, int16 mel feed, bf16 step); the per-op redesign candidates
and negatives are recorded in ops/augment.py's docstrings and
tools/probe_pitch_rational.py's decorrelation ladder.

bench.py --all reproduces the end numbers (crnn_train_aug[_bf16]_clips_per_s)
on the same session.
"""

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
from nanowakeword_tpu.ops.augment import (AugmentParams, augment_batch,
                                          pitch_grid, resample_pitch,
                                          resample_pitch_grouped,
                                          pitch_window, spec_augment)
from nanowakeword_tpu.ops.mel_pallas import mel_frontend_fused
from nanowakeword_tpu.train.optim import build_optimizer
from nanowakeword_tpu.train.step import create_train_state, make_train_step

BATCH = 2048
N_STEPS = 16


def timed_chain(name, body, carry_init, args):
    """Chain N_STEPS calls of body(i, carry, *args) in one jit; time 2nd run.

    The sync fetches exactly ONE scalar: through the relay every device_get
    is a serial ~25 ms round trip, so fetching a parameter tree (dozens of
    leaves) charges seconds of RTT to the measurement (measured: a carried
    TrainState fetch read 236 ms/step where the true step is ~14 ms). The
    scalar is folded from the live carry, so the chain cannot be DCE'd.
    """
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


def main():
    rng = np.random.default_rng(0)
    base = {"activation_function": "relu", "embedding_dim": 64,
            "crnn_cnn_channels": [16, 32, 32], "crnn_rnn_type": "gru"}
    crnn = Model(config=dict(base), model_name="p_crnn",
                 input_shape=(16, 96), model_type="crnn", layer_dim=64,
                 n_blocks=2, dropout_prob=0.0)

    _enc_host = default_encoder_variables()
    encoder = build_encoder(infer_encoder_arch(_enc_host),
                            dtype=jnp.bfloat16, precision=None)
    enc_vars = jax.device_put(_enc_host)

    audio = jax.device_put(np.asarray(
        rng.integers(-16000, 16000, (BATCH, 16000)), np.int16))
    bg = jax.device_put(np.asarray(
        rng.integers(-2000, 2000, (BATCH, 16000)), np.float32))
    rirs = jax.device_put(np.zeros((BATCH, 1600), np.float32))
    fg_lens = jax.device_put(np.full(BATCH, 16000, np.int32))
    flags = jax.device_put(np.ones(BATCH, bool))
    no_flags = jax.device_put(np.zeros(BATCH, bool))
    labels = jax.device_put(np.asarray(rng.random(BATCH) < 0.5, np.float32))
    feats16 = jax.device_put(np.asarray(
        rng.normal(size=(BATCH, 16, 96)), np.float32))

    aug_params = AugmentParams.from_settings({"rir_prob": 0.0})  # = rational
    aug_grouped = AugmentParams.from_settings({"rir_prob": 0.0,
                                               "pitch_rational": False})
    aug_nopitch = AugmentParams.from_settings({"rir_prob": 0.0,
                                               "pitch_prob": 0.0})

    tx = build_optimizer({"optimizer_type": "adamw",
                          "learning_rate_max": 1e-3,
                          "lr_scheduler_type": "onecycle"}, 1000)
    state = jax.device_put(create_train_state(crnn.module, crnn.variables,
                                              tx))
    compute_dtype = "bfloat16" if "--bf16" in sys.argv else "float32"
    print(f"train-step compute_dtype: {compute_dtype}")
    step = make_train_step(crnn.module, tx, donate=False, jit=False,
                           compute_dtype=compute_dtype)

    def key_of(i):
        return jax.random.fold_in(jax.random.PRNGKey(0), i)

    # --- pitch alone (the known-heaviest augment op) ---
    window = pitch_window(2.0)
    def pitch_body(i, acc, a):
        k = key_of(i)
        semis = jax.random.uniform(k, (BATCH,), minval=-2.0, maxval=2.0)
        out = jax.vmap(lambda x, s: resample_pitch(
            x, s, jnp.bool_(True), window=window))(
                a.astype(jnp.float32), semis)
        return acc + out[0, 0]
    timed_chain("pitch only", pitch_body, jnp.float32(0.0), (audio,))

    grid16 = pitch_grid(-2.0, 2.0, 16)
    def pitch_grp_body(i, acc, a):
        k = key_of(i)
        perm = jax.random.permutation(k, 16)
        out = resample_pitch_grouped(a.astype(jnp.float32), grid16, perm,
                                     jnp.ones(BATCH, bool), window=window)
        return acc + out[0, 0]
    timed_chain("pitch only (grouped R=16)", pitch_grp_body,
                jnp.float32(0.0), (audio,))

    # --- cumulative prefixes of the config-3 chain ---
    def aug_body(i, acc, a, b, r, fl, hb, hr):
        k = key_of(i)
        out = augment_batch(k, a, b, r, fl, hb, hr, aug_params)
        return acc + out[0, 0].astype(jnp.float32)
    timed_chain("augment (default=rational)", aug_body, jnp.float32(0.0),
                (audio, bg, rirs, fg_lens, flags, no_flags))

    def aug_grp_body(i, acc, a, b, r, fl, hb, hr):
        k = key_of(i)
        out = augment_batch(k, a, b, r, fl, hb, hr, aug_grouped)
        return acc + out[0, 0].astype(jnp.float32)
    timed_chain("augment (grouped pitch)", aug_grp_body, jnp.float32(0.0),
                (audio, bg, rirs, fg_lens, flags, no_flags))

    aug_cont = AugmentParams.from_settings({"rir_prob": 0.0,
                                            "pitch_grid_rates": 0})
    def aug_cont_body(i, acc, a, b, r, fl, hb, hr):
        k = key_of(i)
        out = augment_batch(k, a, b, r, fl, hb, hr, aug_cont)
        return acc + out[0, 0].astype(jnp.float32)
    timed_chain("augment (continuous pitch)", aug_cont_body,
                jnp.float32(0.0),
                (audio, bg, rirs, fg_lens, flags, no_flags))

    def aug_np_body(i, acc, a, b, r, fl, hb, hr):
        k = key_of(i)
        out = augment_batch(k, a, b, r, fl, hb, hr, aug_nopitch)
        return acc + out[0, 0].astype(jnp.float32)
    timed_chain("augment (pitch off)", aug_np_body, jnp.float32(0.0),
                (audio, bg, rirs, fg_lens, flags, no_flags))

    def mel_body(i, acc, a, b, r, fl, hb, hr):
        k = key_of(i)
        aug = augment_batch(k, a, b, r, fl, hb, hr, aug_params)
        mel = mel_frontend_fused(aug, out_dtype=jnp.bfloat16)
        return acc + mel[0, 0, 0].astype(jnp.float32)
    timed_chain("augment+mel", mel_body, jnp.float32(0.0),
                (audio, bg, rirs, fg_lens, flags, no_flags))

    def enc_body(i, acc, ev, a, b, r, fl, hb, hr):
        k = key_of(i)
        aug = augment_batch(k, a, b, r, fl, hb, hr, aug_params)
        mel = mel_frontend_fused(aug, out_dtype=jnp.bfloat16)
        mel = spec_augment(k, mel)
        emb = encoder.apply(ev, mel[:, EMB_OFFSET:])
        return acc + emb[0, 0, 0].astype(jnp.float32)
    timed_chain("augment+mel+spec+encoder", enc_body, jnp.float32(0.0),
                (enc_vars, audio, bg, rirs, fg_lens, flags, no_flags))

    # --- train step alone on precomputed features ---
    def train_body(i, carry, f, y):
        st, _ = carry
        new_state, metrics = step(st, f, y)
        return new_state, metrics.loss
    timed_chain("train step only (feats)", train_body,
                (state, jnp.float32(0.0)), (feats16, labels))

    # --- the full config-3 step (bench.py parity) ---
    def full_body(i, carry, ev, a, b, r, fl, hb, hr, y):
        st, _ = carry
        k = key_of(i)
        aug = augment_batch(k, a, b, r, fl, hb, hr, aug_params)
        mel = mel_frontend_fused(aug, out_dtype=jnp.bfloat16)
        mel = spec_augment(k, mel)
        emb = encoder.apply(ev, mel[:, EMB_OFFSET:])
        f = jnp.pad(emb, ((0, 0), (16 - emb.shape[1], 0), (0, 0)))
        new_state, metrics = step(st, f, y)
        return new_state, metrics.loss
    timed_chain("FULL config-3 step", full_body,
                (state, jnp.float32(0.0)),
                (enc_vars, audio, bg, rirs, fg_lens, flags, no_flags,
                 labels))

    def full_grp_body(i, carry, ev, a, b, r, fl, hb, hr, y):
        st, _ = carry
        k = key_of(i)
        aug = augment_batch(k, a, b, r, fl, hb, hr, aug_grouped)
        mel = mel_frontend_fused(aug, out_dtype=jnp.bfloat16)
        mel = spec_augment(k, mel)
        emb = encoder.apply(ev, mel[:, EMB_OFFSET:])
        f = jnp.pad(emb, ((0, 0), (16 - emb.shape[1], 0), (0, 0)))
        new_state, metrics = step(st, f, y)
        return new_state, metrics.loss
    timed_chain("FULL config-3 (grouped)", full_grp_body,
                (state, jnp.float32(0.0)),
                (enc_vars, audio, bg, rirs, fg_lens, flags, no_flags,
                 labels))


if __name__ == "__main__":
    main()
