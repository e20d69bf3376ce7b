"""Loss functions: parity with the reference's torch semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nanowakeword_tpu.train import loss as L


@pytest.fixture
def batch(rng):
    logits = jnp.asarray(rng.normal(scale=3.0, size=64).astype(np.float32))
    labels = jnp.asarray((rng.random(64) < 0.3).astype(np.float32))
    return logits, labels


class TestBiasWeighted:
    def test_matches_manual_computation(self, batch):
        """Re-derive the reference formula (modules/loss.py:3-40) in numpy."""
        logits, labels = batch
        ln, lb = np.asarray(logits, np.float64), np.asarray(labels, np.float64)
        bias, sm = 0.75, 0.05
        pos = lb > 0.5
        soft = lb * (1 - sm) + 0.5 * sm
        yp = 1 / (1 + np.exp(-ln))
        pos_t = -soft * np.log(np.clip(yp, 1e-7, None))
        neg_t = -(1 - soft) * np.log(np.clip(1 - yp, 1e-7, None))
        expected = bias * neg_t[~pos].mean() + (1 - bias) * pos_t[pos].mean()

        total, per_ex = L.bias_weighted_loss(logits, labels, bias)
        assert float(total) == pytest.approx(expected, rel=1e-3)
        # per-example: weighted by class (loss.py:38)
        exp_pe = np.where(pos, (1 - bias) * pos_t, bias * neg_t)
        np.testing.assert_allclose(np.asarray(per_ex), exp_pe,
                                   rtol=1e-3, atol=1e-5)

    def test_all_one_class_is_finite(self):
        logits = jnp.asarray([1.0, -2.0, 0.5])
        labels = jnp.zeros(3)
        total, _ = L.bias_weighted_loss(logits, labels, 0.75)
        assert np.isfinite(float(total))

    def test_grads_flow(self, batch):
        logits, labels = batch
        g = jax.grad(lambda l: L.bias_weighted_loss(l, labels, 0.75)[0])(logits)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0


class TestLogitReg:
    def test_zero_inside_margin(self):
        logits = jnp.asarray([3.0, -4.0])
        labels = jnp.asarray([1.0, 0.0])
        assert float(L.logit_regularisation(logits, labels, 6.0)) == 0.0

    def test_penalises_extremes(self):
        logits = jnp.asarray([10.0, -12.0])
        labels = jnp.asarray([1.0, 0.0])
        # (10-6)^2 + (12-6)^2 = 16 + 36
        assert float(L.logit_regularisation(logits, labels, 6.0)) == \
            pytest.approx(16.0 + 36.0)

    def test_wrong_side_not_penalised(self):
        """Reg clamps only beyond +/-margin in the confident direction
        (train_model.py:544-549): a positive with a very negative logit is
        the BCE's job, not the regulariser's."""
        logits = jnp.asarray([-10.0])
        labels = jnp.asarray([1.0])
        assert float(L.logit_regularisation(logits, labels, 6.0)) == 0.0


class TestRawBCE:
    def test_matches_definition(self, batch):
        logits, labels = batch
        p = 1 / (1 + np.exp(-np.asarray(logits, np.float64)))
        lb = np.asarray(labels, np.float64)
        expected = -(lb * np.log(p) + (1 - lb) * np.log(1 - p))
        np.testing.assert_allclose(np.asarray(L.raw_bce(logits, labels)),
                                   expected, rtol=1e-3, atol=1e-5)

    def test_stable_at_extremes(self):
        out = L.raw_bce(jnp.asarray([500.0, -500.0]), jnp.asarray([0.0, 1.0]))
        assert np.isfinite(np.asarray(out)).all()


class TestFocal:
    def test_downweights_easy_negatives(self):
        easy = jnp.asarray([-8.0])   # confident negative
        hard = jnp.asarray([0.5])    # borderline negative
        labels = jnp.asarray([0.0])
        le, _ = L.asymmetric_focal_loss(easy, labels, 0.75)
        lh, _ = L.asymmetric_focal_loss(hard, labels, 0.75)
        be, _ = L.bias_weighted_loss(easy, labels, 0.75, smoothing=0.0)
        bh, _ = L.bias_weighted_loss(hard, labels, 0.75, smoothing=0.0)
        # focal shrinks the easy-negative loss much more than the hard one
        assert float(le) / float(be) < float(lh) / float(bh)


class TestDistill:
    def test_perfect_student_minimises(self):
        t = jnp.asarray([4.0, -4.0, 2.0])
        labels = jnp.asarray([1.0, 0.0, 1.0])
        good = L.distill_loss(t, t, labels, temperature=4.0, alpha=0.7)
        bad = L.distill_loss(-t, t, labels, temperature=4.0, alpha=0.7)
        assert float(good) < float(bad)
