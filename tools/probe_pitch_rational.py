"""Probe: rational-rate (p/64) polyphase pitch resample vs the grouped
einsum path. Measures both at 2048 x 16000 on the live backend and checks
the rational path against explicit linear interpolation.

The candidate formulation: with rate p/q (q = 64 a power of two), output
row t of out.reshape(n/q, q) reads exactly x[t*p : t*p + p + 1], so the
overlapping spans are ONE reshape + a 1-column shifted tail — no one-hot
span select at all — and the interpolation is a [p+1, q] constant-weight
matmul per rate. FLOPs: n*(p+1) MAC/clip vs the span-select einsum's
n/frame * n/blk * window ~ 26 MMAC/clip.

MEASUREMENT TRAP (recorded; cost half a round): the first version of this
probe timed `fn(closure_constant_perm, x)` inside a fori_loop whose body
did not depend on the loop index. Two artifacts followed: (a) the
closure-captured perm became a GRAPH CONSTANT, so the one-hot routing
matmuls constant-folded into free relayouts, and (b) the loop-invariant
body let XLA hoist the entire resample out of the loop. The probe read
1.04 ms/batch for one-hot routing; the real in-chain cost (traced perm,
profile_config3) was ~10 ms — the routing matmuls materialize the full
[R, G*n] batch twice at HIGHEST precision. This version carries the
array THROUGH the loop (serial, nothing invariant) and derives perm from
fold_in(i), exactly like the production augment chain; it reproduces the
in-chain ranking.

DECORRELATION LADDER (all measured here, v5e-1, B=2048 x 16000 f32):
    grouped einsum (traced perm, baseline)   3.4 ms/batch
    rational, one-hot matmul routing         8.2 ms  REJECTED
    rational, row-gather routing             9.2 ms  REJECTED (traced
        16-row gather of 8 MB rows lowers poorly on TPU)
    rational, per-group lax.switch           3.3 ms  REJECTED (no HBM
        routing, but each conditional copies its 8 MB operand + result)
    rational, INTERLEAVED static b%R map     2.0 ms  SHIPPED — no traced
        perm at all; see resample_pitch_rational's docstring for why the
        static map preserves the statistics the perm protected.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_pitch_rational.py
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from nanowakeword_tpu.ops.augment import (pitch_grid, pitch_pgrid,
                                          pitch_window,
                                          resample_pitch_grouped,
                                          resample_pitch_rational)

BATCH, N, Q, R = 2048, 16000, 64, 16
N_STEPS = 32


def rational_resample_group(x, p: int, q: int = Q):
    """x [G, n] at static rate p/q -> [G, n]; linear interpolation."""
    G, n = x.shape
    nq = n // q
    cdt = jnp.bfloat16
    pad = nq * p + 1 - n
    xp = jnp.pad(x, ((0, 0), (0, max(pad, 0)))) if pad > 0 else x
    rows = xp[:, :nq * p].reshape(G, nq, p)
    tail = xp[:, p:nq * p + 1:p]                     # x[(t+1)*p], t=0..nq-1
    spans = jnp.concatenate([rows, tail[:, :, None]], axis=2)  # [G, nq, p+1]
    # hat weights: column j interpolates position j*p/q inside the span
    m = jnp.arange(p + 1, dtype=jnp.float32)[:, None]
    jpos = (jnp.arange(q, dtype=jnp.float32) * p / q)[None, :]
    W = jnp.maximum(0.0, 1.0 - jnp.abs(jpos - m)).astype(cdt)  # [p+1, q]
    out = jnp.einsum("gnp,pq->gnq", spans.astype(cdt), W,
                     preferred_element_type=jnp.float32).reshape(G, n)
    valid = jnp.arange(n) * p <= (n - 1) * q
    return jnp.where(valid[None, :], out, 0.0)


def rational_batch(x, p_vals):
    """Interleaved groups, NO rate decorrelation: clip b at p_vals[b % R]."""
    B, n = x.shape
    R = len(p_vals)
    xg = x.reshape(B // R, R, n)
    outs = [rational_resample_group(xg[:, r], int(p_vals[r]))
            for r in range(R)]
    return jnp.stack(outs, axis=1).reshape(B, n)


def rational_batch_onehot_routed(x, p_vals, perm):
    """The REJECTED routing: one-hot [R, R] matmuls with per-operand
    precision (DEFAULT on the {0,1} operand, HIGHEST on the data). Exact,
    but with a traced perm it materializes the batch twice through the
    MXU — kept here so the negative stays measurable."""
    B, n = x.shape
    R = len(p_vals)
    G = B // R
    prec = (jax.lax.Precision.DEFAULT, jax.lax.Precision.HIGHEST)
    S = (perm[None, :] == jnp.arange(R)[:, None]).astype(x.dtype)  # [R, O]
    xg = jnp.einsum("ro,om->rm", S, x.reshape(R, G * n), precision=prec)
    outs = [rational_resample_group(xg[r].reshape(G, n), int(p_vals[r]))
            for r in range(R)]
    z = jnp.stack(outs).reshape(R, G * n)
    return jnp.einsum("or,rm->om", S.T, z, precision=prec).reshape(B, n)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 0.3, (BATCH, N)).astype(np.float32))
    p_vals = np.round(2.0 ** (np.linspace(-2, 2, R) / 12.0) * Q).astype(int)
    print("p grid:", p_vals)

    # correctness vs explicit linear interp (one group, worst p)
    small = np.asarray(x[:4])
    got = np.asarray(rational_resample_group(jnp.asarray(small), 72))
    pos = np.arange(N) * 72.0 / Q
    lo = np.clip(np.floor(pos).astype(int), 0, N - 1)
    frac = (pos - lo).astype(np.float32)
    ref = small[:, lo] * (1 - frac) + small[:, np.clip(lo + 1, 0, N - 1)] \
        * frac
    ref = np.where(pos <= N - 1, ref, 0.0)
    err = np.abs(got - ref).max()
    # bf16 operand rounding bound — same as resample_pitch's tested bound
    tol = float(np.abs(small).max()) * 2.0 ** -8
    print("max err vs explicit interp:", err, "tol:", tol)
    assert err < tol

    def timed(name, fn):
        """fn(i, x) -> [B, n]; the array is CARRIED through the loop so no
        iteration can be hoisted, and fn sees a fresh traced perm per i."""
        @jax.jit
        def chain(a):
            out = jax.lax.fori_loop(0, N_STEPS, fn, a)
            return out.reshape(-1)[0]
        float(chain(x))
        t0 = time.perf_counter()
        float(chain(x))
        dt = (time.perf_counter() - t0) / N_STEPS
        print(f"{name:>32}: {dt * 1e3:8.2f} ms/batch", flush=True)
        return dt

    grid = pitch_grid(-2.0, 2.0, R)
    w = pitch_window(2.0)
    apply = jnp.ones(BATCH, bool)
    p_static = tuple(int(p) for p in p_vals)
    pgrid = pitch_pgrid(-2.0, 2.0, R)
    key = jax.random.PRNGKey(0)

    def perm_of(i):
        return jax.random.permutation(jax.random.fold_in(key, i), R)

    timed("grouped einsum", lambda i, a: resample_pitch_grouped(
        a, grid, perm_of(i), apply, window=w))
    timed("rational p/64 (no decorr)", lambda i, a: rational_batch(
        a, p_static))
    timed("rational + one-hot routing", lambda i, a:
          rational_batch_onehot_routed(a, p_static, perm_of(i)))
    timed("production rational (interleaved)", lambda i, a:
          resample_pitch_rational(a, pgrid, apply))


if __name__ == "__main__":
    main()
