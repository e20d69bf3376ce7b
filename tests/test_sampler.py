"""ISBL dataset/sampler: index math, composition quotas, hardness dynamics."""

import numpy as np
import pytest

from nanowakeword_tpu.data.dataset import (AdaptiveLossAwareDataset,
                                           DynamicClassAwareSampler,
                                           ValidationDataset)


@pytest.fixture
def manifest(tmp_path):
    """Three feature files: targets 't' (40), negatives 'n' (100), 'b' (60)."""
    rng = np.random.default_rng(0)
    paths = {}
    for key, n in [("t", 40), ("n", 100), ("b", 60)]:
        p = tmp_path / f"{key}.npy"
        np.save(p, rng.normal(size=(n, 16, 96)).astype(np.float32))
        paths[key] = str(p)
    return {"targets": {"t": paths["t"]},
            "negatives": {"n": paths["n"], "b": paths["b"]}}


class TestDataset:
    def test_global_index_space(self, manifest):
        ds = AdaptiveLossAwareDataset(manifest)
        assert len(ds) == 200
        f, lbl, idx = ds[0]
        assert f.shape == (16, 96) and lbl == 1.0 and idx == 0
        _, lbl40, _ = ds[40]          # first negative
        assert lbl40 == 0.0
        _, lbl199, _ = ds[199]
        assert lbl199 == 0.0
        with pytest.raises(IndexError):
            ds[200]

    def test_gather_batches(self, manifest):
        ds = AdaptiveLossAwareDataset(manifest)
        feats, labels, idx = ds.gather(np.asarray([0, 39, 40, 150]))
        assert feats.shape == (4, 16, 96)
        np.testing.assert_array_equal(labels, [1, 1, 0, 0])

    def test_hardness_update_and_floor(self, manifest):
        ds = AdaptiveLossAwareDataset(manifest)
        idx = np.asarray([0, 1, 2])
        ds.update_hardness(idx, np.asarray([0.0, 0.0, 10.0]), alpha=0.5,
                           floor=0.05)
        np.testing.assert_allclose(ds.sample_hardness[idx], [0.5, 0.5, 5.5])
        for _ in range(20):
            ds.update_hardness(idx[:2], np.zeros(2), alpha=0.5, floor=0.05)
        assert (ds.sample_hardness[:2] >= 0.05).all()

    def test_hardness_reset(self, manifest):
        ds = AdaptiveLossAwareDataset(manifest)
        ds.sample_hardness[:] = 0.1
        ds.reset_hardness(decay=0.5)
        np.testing.assert_allclose(ds.sample_hardness, 0.55)


class TestSampler:
    def test_num_batches_limited_by_smallest_pool(self, manifest):
        ds = AdaptiveLossAwareDataset(manifest)
        # 't' pool has 40 samples, quota 8 -> 5 batches max
        s = DynamicClassAwareSampler(ds, {"t": 8, "negatives": 16}, manifest)
        assert s.num_batches == 5

    def test_composition_quotas_respected(self, manifest):
        ds = AdaptiveLossAwareDataset(manifest)
        s = DynamicClassAwareSampler(ds, {"targets": 8, "n": 16, "b": 4},
                                     manifest)
        batch = s.sample_batch()
        assert len(batch) == 28
        batch = np.asarray(batch)
        assert ((batch < 40).sum()) == 8                      # targets
        assert (((batch >= 40) & (batch < 140)).sum()) == 16  # n
        assert ((batch >= 140).sum()) == 4                    # b

    def test_category_rule_spans_all_keys(self, manifest):
        ds = AdaptiveLossAwareDataset(manifest)
        s = DynamicClassAwareSampler(ds, {"negatives": 32}, manifest)
        seen = set()
        for _ in range(30):
            seen.update(s.sample_batch())
        assert any(i >= 140 for i in seen) and any(40 <= i < 140 for i in seen)

    def test_hardness_biases_selection(self, manifest):
        ds = AdaptiveLossAwareDataset(manifest)
        ds.sample_hardness[:] = 1e-6
        ds.sample_hardness[70] = 1e6   # one extremely hard negative
        s = DynamicClassAwareSampler(ds, {"n": 4}, manifest, seed=3)
        counts = sum(70 in s.sample_batch() for _ in range(50))
        assert counts > 45

    def test_empty_pool_gives_zero_batches(self, manifest):
        ds = AdaptiveLossAwareDataset(manifest)
        s = DynamicClassAwareSampler(ds, {"missing_key": 8}, manifest)
        assert s.num_batches == 0

    def test_iterator_deterministic_given_seed(self, manifest):
        ds = AdaptiveLossAwareDataset(manifest)
        comp = {"targets": 4, "negatives": 8}
        a = list(DynamicClassAwareSampler(ds, comp, manifest, seed=10))
        b = list(DynamicClassAwareSampler(ds, comp, manifest, seed=10))
        assert a == b


class TestDeviceSampling:
    """The device-cached loop's on-device _sample_rule (train/cached.py)."""

    def test_approx_matches_exact_semantics(self):
        import jax
        import jax.numpy as jnp
        from nanowakeword_tpu.train.cached import _sample_rule

        n, quota = 4096, 64
        pool = jnp.arange(1000, 1000 + n, dtype=jnp.int32)
        hardness = jnp.full(n + 2000, 1e-6).at[1000 + n // 2].set(1e6)
        for mode in ("exact", "approx"):
            hits = 0
            for trial in range(20):
                idx = np.asarray(_sample_rule(
                    jax.random.PRNGKey(trial), pool, hardness, quota,
                    False, mode))
                # valid draw: quota honored, all from pool, no duplicates
                assert idx.shape == (quota,)
                assert np.isin(idx, np.asarray(pool)).all()
                assert len(np.unique(idx)) == quota
                hits += int(1000 + n // 2 in idx)
            # the one extremely hard sample is (almost) always selected
            assert hits >= 18, f"{mode}: hard sample picked {hits}/20"

    def test_auto_switches_on_pool_size(self, monkeypatch):
        import jax
        import jax.numpy as jnp
        from nanowakeword_tpu.train import cached
        assert cached.APPROX_SAMPLING_MIN_POOL > 4096  # small pools exact:
        # the tiny-dataset tests above must keep reference-exact sampling

        n, quota = 2048, 16
        pool = jnp.arange(n, dtype=jnp.int32)
        hardness = jnp.linspace(0.05, 1.0, n)
        key = jax.random.PRNGKey(5)

        def draw(mode):
            return np.asarray(cached._sample_rule(
                key, pool, hardness, quota, False, mode))

        # same key => deterministic: auto must equal the mode it routes to
        monkeypatch.setattr(cached, "APPROX_SAMPLING_MIN_POOL", n - 1)
        assert (draw("auto") == draw("approx")).all()
        monkeypatch.setattr(cached, "APPROX_SAMPLING_MIN_POOL", n + 1)
        assert (draw("auto") == draw("exact")).all()

    def test_unknown_sampling_mode_rejected(self):
        import optax
        import pytest as _pytest
        from nanowakeword_tpu.train.cached import make_cached_train_loop
        with _pytest.raises(ValueError, match="device_cache.sampling"):
            make_cached_train_loop(None, optax.sgd(1e-3), quotas=(4,),
                                   replace=(False,), k_steps=1,
                                   sampling="aprox")


class TestValidation:
    def test_flat_enumeration(self, manifest):
        vd = ValidationDataset(manifest)
        assert len(vd) == 200
        batches = list(vd.batches(64))
        assert sum(b[0].shape[0] for b in batches) == 200
        assert batches[0][0].shape[1:] == (16, 96)
        labels = np.concatenate([b[1] for b in batches])
        assert labels.sum() == 40
