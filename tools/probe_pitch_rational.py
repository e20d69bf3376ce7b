"""Probe: rational-rate (p/64) polyphase pitch resample vs the grouped
einsum path. Measures both at 2048 x 16000 on the live backend and checks
the rational path against explicit linear interpolation.

The candidate formulation: with rate p/q (q = 64 a power of two), output
row t of out.reshape(n/q, q) reads exactly x[t*p : t*p + p + 1], so the
overlapping spans are ONE reshape + a 1-column shifted tail — no one-hot
span select at all — and the interpolation is a [p+1, q] constant-weight
matmul per rate. FLOPs: n*(p+1) MAC/clip vs the span-select einsum's
n/frame * n/blk * window ~ 26 MMAC/clip.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from nanowakeword_tpu.ops.augment import (pitch_grid, pitch_window,
                                          resample_pitch_grouped)

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
    """Interleaved groups: clip b gets rate p_vals[b % R]."""
    B, n = x.shape
    R = len(p_vals)
    xg = x.reshape(B // R, R, n)
    outs = [rational_resample_group(xg[:, r], int(p_vals[r]))
            for r in range(R)]
    return jnp.stack(outs, axis=1).reshape(B, n)


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

    def timed(name, fn, *args):
        @jax.jit
        def chain(*a):
            def body(i, acc):
                out = fn(*a)
                return acc + out[0, 0] + i * 0.0
            return jax.lax.fori_loop(0, N_STEPS, body, jnp.float32(0.0))
        float(chain(*args))
        t0 = time.perf_counter()
        float(chain(*args))
        dt = (time.perf_counter() - t0) / N_STEPS
        print(f"{name:>28}: {dt * 1e3:8.2f} ms/batch")
        return dt

    grid = pitch_grid(-2.0, 2.0, R)
    w = pitch_window(2.0)
    apply = jnp.ones(BATCH, bool)
    perm = jnp.arange(R)
    p_static = tuple(int(p) for p in p_vals)
    timed("grouped einsum", lambda a: resample_pitch_grouped(
        a, grid, perm, apply, window=w), x)
    timed("rational p/64", lambda a: rational_batch(a, p_static), x)


if __name__ == "__main__":
    main()
