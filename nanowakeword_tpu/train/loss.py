"""Losses: bias-weighted asymmetric BCE (+ per-example hardness signal),
asymmetric focal loss, logit regularisation, and binary KD loss.

Parity target: `/root/reference/nanowakeword/modules/loss.py:3-40`
(BiasWeightedLoss), the logit regulariser inside the training loop
(`train/train_model.py:529-551`), and the distillation loss
(`train/distill.py:169-184`). The commented-out AsymmetricFocalLoss
(`modules/loss.py:43-81`) — selectable by name but broken in the reference —
is implemented and working here.

Everything is a pure jnp function usable inside a jitted/pjitted train step.
Masked means replace the reference's boolean indexing (data-dependent shapes
don't jit); `sum(term * mask) / max(sum(mask), 1)` is exactly equivalent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-7


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    denom = jnp.maximum(mask.sum(), 1.0)
    return (x * mask).sum() / denom


def bias_weighted_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                       loss_bias: float, smoothing: float = 0.05):
    """Asymmetric BCE with class weighting and targets-only label smoothing.

    Masks come from the HARD labels before smoothing (loss.py:18-23).

    Returns:
        (total_loss scalar, per_example_loss [B]) — per-example uses the same
        class weighting, for ISBL hardness tracking (loss.py:38).
    """
    pos_mask = (labels > 0.5).astype(jnp.float32)
    neg_mask = 1.0 - pos_mask

    soft = labels * (1.0 - smoothing) + 0.5 * smoothing
    yp = jax.nn.sigmoid(logits)

    pos_term = -soft * jnp.log(jnp.maximum(yp, EPS))
    neg_term = -(1.0 - soft) * jnp.log(jnp.maximum(1.0 - yp, EPS))

    total = (loss_bias * _masked_mean(neg_term, neg_mask)
             + (1.0 - loss_bias) * _masked_mean(pos_term, pos_mask))

    per_example = jnp.where(pos_mask > 0,
                            (1.0 - loss_bias) * pos_term,
                            loss_bias * neg_term)
    return total, jax.lax.stop_gradient(per_example)


def asymmetric_focal_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                          loss_bias: float, gamma_pos: float = 0.0,
                          gamma_neg: float = 4.0, smoothing: float = 0.05):
    """Asymmetric focal loss (Ridnik et al., 2021): strong down-weighting of
    easy negatives. Reference declared it (`train_model.py:511-517`) but left
    the implementation commented out; this one works."""
    pos_mask = (labels > 0.5).astype(jnp.float32)
    neg_mask = 1.0 - pos_mask

    soft = labels * (1.0 - smoothing) + 0.5 * smoothing
    p = jax.nn.sigmoid(logits)

    p_pos = jnp.maximum(p, EPS)
    pos_term = -soft * (1.0 - p_pos) ** gamma_pos * jnp.log(p_pos)
    p_neg = jnp.maximum(1.0 - p, EPS)
    # ASL: modulate by the probability of the WRONG class (p for negatives),
    # so confidently-classified easy negatives vanish from the loss. (The
    # reference's commented-out draft used p_neg**gamma here, which would
    # down-weight HARD negatives — inverted vs. Ridnik et al.)
    neg_term = -(1.0 - soft) * p ** gamma_neg * jnp.log(p_neg)

    total = (loss_bias * _masked_mean(neg_term, neg_mask)
             + (1.0 - loss_bias) * _masked_mean(pos_term, pos_mask))
    per_example = jnp.where(pos_mask > 0,
                            (1.0 - loss_bias) * pos_term,
                            loss_bias * neg_term)
    return total, jax.lax.stop_gradient(per_example)


def logit_regularisation(logits: jnp.ndarray, labels: jnp.ndarray,
                         margin: float) -> jnp.ndarray:
    """Penalise positive logits above +margin and negative logits below
    -margin (train_model.py:529-551): keeps the decision boundary calibrated
    instead of letting confidences run to ±25."""
    pos_mask = (labels >= 0.5).astype(jnp.float32)
    neg_mask = 1.0 - pos_mask
    excess_pos = jnp.maximum(logits - margin, 0.0)
    excess_neg = jnp.maximum(-logits - margin, 0.0)
    reg = (_masked_mean(excess_pos ** 2, pos_mask)
           + _masked_mean(excess_neg ** 2, neg_mask))
    return reg


def raw_bce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Unweighted per-example BCE-with-logits, the hardness signal
    (train_model.py:574-579). Numerically stable log-sum-exp form."""
    return (jnp.maximum(logits, 0.0) - logits * labels
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def distill_loss(student_logits: jnp.ndarray, teacher_logits: jnp.ndarray,
                 labels: jnp.ndarray, temperature: float, alpha: float):
    """KD loss = alpha * T^2 * binaryKL(teacher_soft, student_soft)
              + (1 - alpha) * BCE(student, labels)   (distill.py:169-184)."""
    t_soft = jax.nn.sigmoid(teacher_logits / temperature)
    s_soft = jax.nn.sigmoid(student_logits / temperature)
    soft = -(t_soft * jnp.log(s_soft + EPS)
             + (1.0 - t_soft) * jnp.log(1.0 - s_soft + EPS)).mean()
    soft = soft * temperature ** 2
    hard = raw_bce(student_logits, labels).mean()
    return alpha * soft + (1.0 - alpha) * hard


LOSS_FUNCTIONS = {
    "bias_weighted": bias_weighted_loss,
    "asymmetric_focal": asymmetric_focal_loss,
}
