"""Throughput benchmark: 1-sec clips/sec per chip (mel + embedding + CRNN).

The BASELINE headline metric: end-to-end audio -> wake-word score throughput
for the CRNN configuration (wav -> mel -> speech-embedding -> CRNN -> prob),
target >= 100k 1-sec clips/sec on a v5e chip. Also measures p50 streaming
frame latency (80 ms chunk -> score) as a secondary statistic.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N/100000}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

TARGET_CLIPS_PER_SEC = 100_000.0


def build_forward():
    import jax
    import jax.numpy as jnp

    from nanowakeword_tpu.data.features import EMB_OFFSET
    from nanowakeword_tpu.models.embedding import SpeechEmbeddingEncoder
    from nanowakeword_tpu.models.model import Model
    from nanowakeword_tpu.ops import mel as melops

    config = {
        "activation_function": "relu",
        "embedding_dim": 96,
        "crnn_cnn_channels": [16, 32, 32],
        "crnn_rnn_type": "gru",
    }
    model = Model(config=config, model_name="bench_crnn",
                  input_shape=(16, 96), model_type="crnn",
                  layer_dim=64, n_blocks=2, dropout_prob=0.0)
    # throughput path: bf16 MXU passes everywhere
    encoder = SpeechEmbeddingEncoder(dtype=jnp.bfloat16, precision=None)
    enc_vars = encoder.init(jax.random.PRNGKey(10),
                            jnp.zeros((1, 76, melops.N_MELS)))
    bf16_vars = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        model.variables)

    def forward(variables, encoder_variables, audio):
        mel = melops.mel_frontend(audio, compute_dtype=jnp.bfloat16)
        emb = encoder.apply(encoder_variables, mel[:, EMB_OFFSET:])
        pad = 16 - emb.shape[1]
        feats = jnp.pad(emb, ((0, 0), (pad, 0), (0, 0)))
        logits = model.module.apply(variables, feats.astype(jnp.bfloat16),
                                    deterministic=True)
        return jax.nn.sigmoid(logits.reshape(-1))

    return jax.jit(forward), bf16_vars, enc_vars


def bench_throughput(batch: int = 4096, iters: int = 32) -> float:
    import jax
    import jax.numpy as jnp

    fwd, variables, enc_vars = build_forward()
    rng = np.random.default_rng(0)
    audio_host = np.asarray(rng.integers(-16000, 16000, (batch, 16000)),
                            np.float32)
    # Inputs live on device (a production input pipeline double-buffers
    # transfers); iterations are chained by a data dependency inside ONE
    # jitted fori_loop so async dispatch cannot hide work from the timer.
    audio = jax.device_put(audio_host)
    variables = jax.device_put(variables)
    enc_vars = jax.device_put(enc_vars)

    @jax.jit
    def loop(variables, enc_vars, audio):
        def body(_, carry):
            # fold the previous result into the input with a non-zero (but
            # negligible) coupling: a literal *0 gets constant-folded and the
            # whole loop body hoisted as invariant.
            out = fwd(variables, enc_vars, audio + carry * jnp.float32(1e-30))
            return out.sum()
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    # NOTE: time a VALUE FETCH of the scalar result, not block_until_ready —
    # on relayed/remote PJRT backends block_until_ready can be a no-op while
    # float() forces real synchronisation.
    float(loop(variables, enc_vars, audio))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(variables, enc_vars, audio))
        best = min(best, time.perf_counter() - t0)
    return batch * iters / best


def bench_stream_latency(n_frames: int = 200) -> float:
    """p50 latency of one fused 80 ms streaming step (mel+embed+score in a
    single device call — the NanoInterpreter fast path)."""
    import jax
    import jax.numpy as jnp

    from nanowakeword_tpu.data.features import AudioFeatures
    from nanowakeword_tpu.models.model import Model

    config = {"activation_function": "relu", "embedding_dim": 96,
              "crnn_cnn_channels": [16, 32, 32], "crnn_rnn_type": "gru"}
    model = Model(config=config, model_name="bench_stream",
                  input_shape=(16, 96), model_type="crnn",
                  layer_dim=64, n_blocks=2, dropout_prob=0.0)
    af = AudioFeatures()

    def fused(variables, state, chunk):
        new_state = af._stream_step_impl(state, chunk)
        feats = new_state.feat_buf[-16:][None]
        logits = model.module.apply(variables, feats, deterministic=True)
        return new_state, jax.nn.sigmoid(logits.reshape(()))

    step = jax.jit(fused, donate_argnums=(1,))
    rng = np.random.default_rng(0)
    chunk = jnp.asarray(rng.integers(-16000, 16000, 1280).astype(np.float32))

    state = af.state
    for _ in range(4):  # compile + warm
        state, score = step(model.variables, state, chunk)
        float(score)

    times = []
    for _ in range(n_frames):
        t0 = time.perf_counter()
        state, score = step(model.variables, state, chunk)
        float(score)  # value fetch = real synchronisation
        times.append(time.perf_counter() - t0)
    return float(np.percentile(times, 50) * 1000.0)


def main():
    throughput = bench_throughput()
    try:
        p50_ms = bench_stream_latency()
    except Exception:  # noqa: BLE001
        p50_ms = None

    result = {
        "metric": "1sec_clips_per_sec_per_chip_mel+embed+crnn_forward",
        "value": round(throughput, 1),
        "unit": "clips/s",
        "vs_baseline": round(throughput / TARGET_CLIPS_PER_SEC, 4),
    }
    if p50_ms is not None:
        result["p50_stream_frame_latency_ms"] = round(p50_ms, 3)
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
