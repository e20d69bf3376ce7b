"""Stage-stripping decomposition of the headline forward path.

Times cumulative prefixes of the product bulk path (int16 PCM -> Pallas
mel -> wide128 encoder -> pad -> CRNN -> score) and standalone CRNN-tail
stages, steady-state (chained fori_loop iterations per value fetch, the
same methodology as bench.py).

Round-3 measurements (v5e-1, batch 4096 x 1 s, bf16):

    mel_only            516 ns/clip     (the Pallas v10 kernel)
    mel+conv1           658             (encoder first conv = 142 ns)
    mel+encoder         678             (convs 2-4 + dense = just 20 ns)
    full                972             (CRNN tail = 293 ns)

    tail standalone:    conv stack 273 (265 without BatchNorm),
                        + BiRNN 65, + Dense ~0

So the tail's 3x3 conv stack is the single biggest non-mel cost — ~9x its
FLOP floor (~30 ns) because 16/32-channel NHWC tensors occupy 16-32 of
128 lanes on TPU (up to 8x padded HBM footprint on every intermediate),
and the encoder's cost is entirely its first conv (input patches K=320).

Fusion analyses (both NEGATIVE, recorded so they are not re-attempted
without new information — the arithmetic, not just the verdict):

* encoder-conv1 into the mel kernel epilogue (round-2 lever #2): conv1
  needs stride-2 time patches of the per-clip mel. In-kernel the mel
  block is [rows, 32] with time on SUBLANES; building [t/2, 320] patches
  needs sublane->lane folding and stride-2 row compaction, both of which
  Mosaic cannot express cheaply (lane-concat of <128-lane vectors is
  rejected; stride-2 sublane selection needs either a relayout or a
  block-diagonal selection dot that costs ~25-90 ns/clip by itself).
  Computing all t positions instead (no compaction) writes a [t, 128]
  block = 24.8 KB/clip — MORE boundary traffic than today's unfused
  6.2 KB mel writeback + 6.2 KB conv read + 11.2 KB conv writeback, so
  the fusion is traffic-NEGATIVE before the overcompute. Blocked.
* Pallas CRNN-tail kernel: conv2/conv3 im2col patches ([pos, 3x3xC])
  hit the same sublane->lane folding wall; shift-MAC formulations with
  channels-only contractions run at 3% MXU utilization (K=16, N=32);
  banded-matrix formulations overcompute 32-130x. The XLA conv's
  internal relayouts are exactly the part Pallas cannot express better
  on these channel-thin shapes. Blocked.
* XLA-level folded-H reformulation (measured round 3, later session):
  fold the small H axis into channels so each 3x3 SAME conv becomes a
  lane-DENSE 1-D conv over W with a block-banded [3, H*Cin, H*Cout]
  weight (16 -> 256 -> 256 -> 128 folded channels, exact to 6e-6 on
  CPU, H/3 ~ 2.7x overcompute). Result: PARITY, 278.5 vs 276.6 ns with
  prefolded weights (391 when the band construction is traced per
  call); a 3-shifted-matmul variant of the same math is 2.6x WORSE
  (709). Stage split: stage1 alone = 176 ns of the 278 — the cost is
  the [B,96,256] stage-1 intermediate's HBM write+readback around the
  max_pool (~110 KB/clip at ~625 GB/s effective), NOT lane relayouts.
  So the earlier "XLA handles channel-thin shapes poorly" hypothesis
  is refined: XLA already runs this tail at the memory-stream bound of
  its dataflow. The only remaining route is a kernel that keeps all
  three stages' intermediates in VMEM (traffic floor ~4.5 KB/clip =
  read [16,96] bf16 + write [12,64]); the pool's stride-2 lane
  compaction that blocked previous designs can be dodged by leaving
  pooled groups in place and zeroing the DEAD input rows of the next
  stage's folded weight (2x K overcompute, dense shapes).
* CLOSING ARITHMETIC on that VMEM-resident folded-tail route (round 3,
  final session) — NEGATIVE; do not build without new primitives. True
  tail FLOPs for [16,96]x[16,32,32]: conv1 0.44M + conv2 3.54M +
  conv3 1.77M = 5.75 MFLOP/clip (29 ns at 197 TFLOP/s peak). The folded
  formulation pays H-folding (3 taps x full folded K) AND dead-row K
  doubling at every pooled stage: even granting free W compaction
  (96->48->24 rows), stage2 = 48 pos x K=768 x N=256 x 2 = 18.9M,
  stage3 = 24 x 768 x 128 x 2 = 4.7M, stage1 = 2.36M -> ~26 MFLOP/clip
  = 132 ns at 100% MXU. Without W compaction (the thing the dead-row
  trick was dodging) it is ~59 MFLOP = 300 ns AT PEAK. The HBM stream
  it would save is ~110 ns/clip; K=768/N<=256 row-thin matmuls with
  interleaved maxes will not run anywhere near peak in a Pallas cell
  (the mel kernel's dots sit at single-digit MXU utilization). So the
  kernel's compute floor alone exceeds the traffic it saves: the XLA
  tail at 273 ns stands as the measured product floor for this
  architecture on this hardware generation.

Usage: python tools/profile_headline.py [variant ...]
Variants: mel_only mel+conv1 mel+encoder full tail_conv tail_conv_nobn
          tail_conv_rnn
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import flax.linen as nn  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

BATCH, ITERS = 4096, 256


def _timeit(name, fn, *args):
    @jax.jit
    def loop(*a):
        def body(_, carry):
            first = a[0] + (carry * jnp.float32(1e-30)).astype(a[0].dtype)
            return fn(first, *a[1:]).astype(jnp.float32)
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    float(loop(*args))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(*args))
        best = min(best, time.perf_counter() - t0)
    ns = best / (BATCH * ITERS) * 1e9
    print(f"{name:18s} {ns:8.1f} ns/clip  "
          f"({BATCH * ITERS / best / 1e3:9.1f}k clips/s)", flush=True)


def _headline_variants():
    from nanowakeword_tpu.data.features import (EMB_OFFSET,
                                                default_encoder_variables)
    from nanowakeword_tpu.models.embedding import (build_encoder,
                                                   infer_encoder_arch)
    from nanowakeword_tpu.models.model import Model
    from nanowakeword_tpu.ops.mel_pallas import mel_frontend_fused

    config = {"activation_function": "relu", "embedding_dim": 96,
              "crnn_cnn_channels": [16, 32, 32], "crnn_rnn_type": "gru"}
    model = Model(config=config, model_name="prof", input_shape=(16, 96),
                  model_type="crnn", layer_dim=64, n_blocks=2,
                  dropout_prob=0.0)
    enc_vars = default_encoder_variables()
    encoder = build_encoder(infer_encoder_arch(enc_vars),
                            dtype=jnp.bfloat16, precision=None)
    bf16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        model.variables)
    p = enc_vars["params"]

    def conv1(mel):
        x = mel[..., None].astype(jnp.bfloat16)
        k = p["Conv_0"]["kernel"].astype(jnp.bfloat16)
        b = p["Conv_0"]["bias"].astype(jnp.bfloat16)
        y = jax.lax.conv_general_dilated(
            x, k, window_strides=(2, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jax.nn.relu(y + b).squeeze(axis=2)

    def v_mel(audio):
        return mel_frontend_fused(audio, out_dtype=jnp.bfloat16).sum()

    def v_conv1(audio):
        mel = mel_frontend_fused(audio, out_dtype=jnp.bfloat16)
        return conv1(mel[:, EMB_OFFSET:]).sum()

    def v_enc(audio):
        mel = mel_frontend_fused(audio, out_dtype=jnp.bfloat16)
        return encoder.apply(enc_vars, mel[:, EMB_OFFSET:]).sum()

    def v_full(audio):
        mel = mel_frontend_fused(audio, out_dtype=jnp.bfloat16)
        emb = encoder.apply(enc_vars, mel[:, EMB_OFFSET:])
        feats = jnp.pad(emb, ((0, 0), (16 - emb.shape[1], 0), (0, 0)))
        logits = model.module.apply(bf16, feats.astype(jnp.bfloat16),
                                    deterministic=True)
        return jax.nn.sigmoid(logits.reshape(-1)).sum()

    rng = np.random.default_rng(0)
    audio = jax.device_put(np.asarray(
        rng.integers(-16000, 16000, (BATCH, 16000)), np.int16))
    return {"mel_only": (v_mel, audio), "mel+conv1": (v_conv1, audio),
            "mel+encoder": (v_enc, audio), "full": (v_full, audio)}


class _ConvStack(nn.Module):
    channels: tuple = (16, 32, 32)
    with_bn: bool = True
    with_rnn: bool = False

    @nn.compact
    def __call__(self, x):
        from nanowakeword_tpu.models.architectures import BiRNN
        h = x[..., None]
        for ch in self.channels:
            h = nn.Conv(ch, (3, 3), padding="SAME", dtype=jnp.bfloat16)(h)
            if self.with_bn:
                h = nn.BatchNorm(use_running_average=True,
                                 dtype=jnp.bfloat16)(h)
            h = nn.relu(h)
            h = nn.max_pool(h, (2, 2), strides=(2, 2))
        if not self.with_rnn:
            return h
        B, Hc, Wc, C = h.shape
        seq = h.transpose(0, 2, 3, 1).reshape(B, Wc, C * Hc)
        return BiRNN(64, 2, "gru", 0.0)(seq, deterministic=True)[:, -1, :]


def _tail_variants():
    rng = np.random.default_rng(0)
    feats = jax.device_put(jnp.asarray(
        rng.normal(size=(BATCH, 16, 96)), jnp.bfloat16))
    out = {}
    for name, mod in (("tail_conv", _ConvStack()),
                      ("tail_conv_nobn", _ConvStack(with_bn=False)),
                      ("tail_conv_rnn", _ConvStack(with_rnn=True))):
        vars_ = jax.device_put(jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
            mod.init(jax.random.PRNGKey(0), feats[:1])))
        out[name] = ((lambda f, v, _m=mod:
                      _m.apply(v, f).sum().astype(jnp.float32)), feats, vars_)
    return out


def main():
    variants = {}
    variants.update(_headline_variants())
    variants.update(_tail_variants())
    only = sys.argv[1:] or list(variants)
    for name in only:
        fn, *args = variants[name]
        _timeit(name, fn, *args)


if __name__ == "__main__":
    main()
