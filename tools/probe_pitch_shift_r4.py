"""Round-4 perf probe: pitch resample + mix_snr shift candidates (config-3).

VERDICT r3 next #2: pitch (6.4 ms) + mix_snr shift (4.2 ms) are 55% of the
19.4 ms config-3 step. Candidates measured here on the real chip:

pitch:
  P0  current resample_pitch (hat-weight MXU einsum)         [baseline]
  P1  polyphase rate-quantized: rate = m/Q, static strided
      slices per (m, phase) + shared static lerp weights — the
      per-clip [F, frame, window] weight tensor (the VPU-bound
      term) disappears entirely; all clips compute all R rates,
      one-hot mask selects.  Q=40 -> R=10 (~0.5 st grid),
      Q=80 -> R=19 (~0.25 st grid).
  P2  stage-stripping of P0: weights-constant / sel-constant /
      einsum-only — the floor decomposition if P1 loses.

shift (mix_snr):
  S0  current two-stage one-hot (concat z; dots at HIGHEST)    [baseline]
  S1  no-z-concat: out = y@low + pad(y[:-1]@upp) — the z buffer
      (131 MB/batch write+read) never materializes.
  S2  S1 with per-operand precision (one-hot side DEFAULT-exact,
      audio side HIGHEST): one-hot {0,1} entries are exact in
      bf16, so only the audio operand needs the multi-pass split.

Timing: chained iterations with a scalar fetch (tunnel rules).
"""

import functools
import math
import time

import numpy as np

import jax
import jax.numpy as jnp

B, N = 2048, 16000
ITERS = 64


def timeit(fn, *args, iters=ITERS, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[0], r)
    t0 = time.perf_counter()
    acc = None
    for _ in range(iters):
        r = fn(*args)
    v = float(np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    return dt * 1e3, v


# --------------------------------------------------------------------------
# pitch P1: polyphase rate-quantized
# --------------------------------------------------------------------------

def _poly_rates(max_abs_st: float, q: int):
    lo = 2.0 ** (-abs(max_abs_st) / 12.0)
    hi = 2.0 ** (abs(max_abs_st) / 12.0)
    m_lo = int(np.floor(lo * q))
    m_hi = int(np.ceil(hi * q))
    return list(range(m_lo, m_hi + 1))


def resample_pitch_poly(x, semitones, apply, q: int = 40):
    """Pitch/speed shift with the rate quantized to m/q (static branches).

    For rate m/q, output sample i = q*t + phi reads position
    m*t + floor(phi*m/q) + frac(phi*m/q): a stride-m slice per phase with a
    STATIC lerp weight — zero per-clip weight tensors, zero gathers.
    m == q is the bit-exact identity, so unapplied clips select it.
    """
    n = x.shape[-1]
    ms = _poly_rates(2.0, q)
    n_t = n // q
    rate = 2.0 ** (semitones / 12.0)
    m_real = rate * q
    m_sel = jnp.clip(jnp.round(m_real).astype(jnp.int32), ms[0], ms[-1])
    m_sel = jnp.where(apply, m_sel, q)

    pad_len = max(m * (n_t - 1) + int(np.floor((q - 1) * m / q)) + 2
                  for m in ms)
    xp = jnp.pad(x, (0, max(0, pad_len - n)))

    out = jnp.zeros_like(x)
    for m in ms:
        cols = []
        for phi in range(q):
            o = int(np.floor(phi * m / q))
            w = phi * m / q - o
            lo = jax.lax.slice(xp, (o,), (o + m * (n_t - 1) + 1,), (m,))
            hi = jax.lax.slice(xp, (o + 1,), (o + 1 + m * (n_t - 1) + 1,),
                               (m,))
            cols.append(lo * (1.0 - np.float32(w)) + hi * np.float32(w))
        block = jnp.stack(cols, axis=-1).reshape(n)       # [t, phi] -> [n]
        pos = jnp.arange(n, dtype=jnp.float32) * (m / q)
        block = jnp.where(pos <= n - 1, block, 0.0)
        out = out + jnp.where(m_sel == m, block, 0.0)
    return out


# --------------------------------------------------------------------------
# shift variants
# --------------------------------------------------------------------------

def shift_s0(x, offset):
    from nanowakeword_tpu.ops.augment import _shift_right
    return _shift_right(x, offset)


def _shift_parts(x, offset, blk=128):
    n = x.shape[-1]
    nb = n // blk
    q, r = offset // blk, offset % blk
    blocks = x.reshape(nb, blk)
    ii = jnp.arange(nb)
    sel = (ii[:, None] - q == ii[None, :]).astype(x.dtype)
    a = jnp.arange(blk)
    low = (a[:, None] + r == a[None, :]).astype(x.dtype)
    upp = (a[:, None] - blk + r == a[None, :]).astype(x.dtype)
    return blocks, sel, low, upp, nb, blk


def shift_s1(x, offset):
    """No z concat: out = y@low + pad(y[:-1]@upp)."""
    blocks, sel, low, upp, nb, blk = _shift_parts(x, offset)
    P = jax.lax.Precision.HIGHEST
    y = jax.lax.dot(sel, blocks, precision=P)
    top = jax.lax.dot(y[:-1], upp, precision=P)
    out = jax.lax.dot(y, low, precision=P) \
        + jnp.concatenate([jnp.zeros((1, blk), x.dtype), top])
    return out.reshape(nb * blk)


def shift_s2(x, offset):
    """S1 with per-operand precision: one-hot operands exact in bf16."""
    blocks, sel, low, upp, nb, blk = _shift_parts(x, offset)
    PH = (jax.lax.Precision.DEFAULT, jax.lax.Precision.HIGHEST)
    HP = (jax.lax.Precision.HIGHEST, jax.lax.Precision.DEFAULT)
    y = jax.lax.dot(sel, blocks, precision=PH)
    top = jax.lax.dot(y[:-1], upp, precision=HP)
    out = jax.lax.dot(y, low, precision=HP) \
        + jnp.concatenate([jnp.zeros((1, blk), x.dtype), top])
    return out.reshape(nb * blk)


def main():
    rng = np.random.default_rng(0)
    x = (rng.integers(-16000, 16000, (B, N)) / 32768.0).astype(np.float32)
    semis = rng.uniform(-2, 2, B).astype(np.float32)
    apply = (rng.random(B) < 0.5)
    offsets = rng.integers(0, N, B).astype(np.int32)

    xd = jnp.asarray(x)
    sd = jnp.asarray(semis)
    ad = jnp.asarray(apply)
    od = jnp.asarray(offsets)

    from nanowakeword_tpu.ops.augment import pitch_window, resample_pitch

    window = pitch_window(2.0)

    def chain(one, *args):
        @jax.jit
        def run(*a):
            def body(c, _):
                y = jax.vmap(one)(c, *a[1:])
                # feed a dependency through so iterations chain
                return c + y[:, :1] * 1e-12, ()
            c, _ = jax.lax.scan(body, a[0], None, length=8)
            return c
        return run

    # correctness of P1 vs a numpy polyphase oracle at one rate
    def oracle(xr, m, q=40):
        pos = np.arange(N) * (m / q)
        lo = np.floor(pos).astype(int)
        w = pos - lo
        lo_c = np.clip(lo, 0, N - 1)
        hi_c = np.clip(lo + 1, 0, N - 1)
        out = xr[lo_c] * (1 - w) + xr[hi_c] * w
        out[pos > N - 1] = 0.0
        return out

    m_test = 43
    st = 12.0 * math.log2(m_test / 40.0)
    got = np.asarray(resample_pitch_poly(jnp.asarray(x[0]),
                                         jnp.float32(st), jnp.bool_(True)))
    want = oracle(x[0], m_test)
    print(f"P1 correctness (m={m_test}): max abs diff "
          f"{np.abs(got - want).max():.2e}")
    ident = np.asarray(resample_pitch_poly(jnp.asarray(x[0]),
                                           jnp.float32(0.3),
                                           jnp.bool_(False)))
    print(f"P1 identity bit-exact: {np.array_equal(ident, x[0])}")

    variants = {
        "P0_current": chain(None, xd) if False else None,
    }

    p0 = jax.jit(lambda xx, ss, aa: jax.vmap(
        lambda c, s, a: resample_pitch(c, s, a, window=window))(xx, ss, aa))
    p1_40 = jax.jit(lambda xx, ss, aa: jax.vmap(
        lambda c, s, a: resample_pitch_poly(c, s, a, q=40))(xx, ss, aa))
    p1_80 = jax.jit(lambda xx, ss, aa: jax.vmap(
        lambda c, s, a: resample_pitch_poly(c, s, a, q=80))(xx, ss, aa))

    def chained(fn):
        @jax.jit
        def run(xx, ss, aa):
            def body(c, _):
                y = fn(c, ss, aa)
                return y, ()
            c, _ = jax.lax.scan(body, xx, None, length=8)
            return c
        def call(xx, ss, aa):
            return run(xx, ss, aa)
        return call

    for name, fn in (("P0_current", p0), ("P1_poly_q40", p1_40),
                     ("P1_poly_q80", p1_80)):
        try:
            t0 = time.perf_counter()
            ms, v = timeit(chained(lambda a, b, c, f=fn: f(a, b, c)),
                           xd, sd, ad, iters=8)
            print(f"{name}: {ms / 8:.2f} ms/batch (compile+run "
                  f"{time.perf_counter() - t0:.0f}s)")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")

    # shift correctness + timing
    s0 = jax.jit(lambda xx, oo: jax.vmap(shift_s0)(xx, oo))
    s1 = jax.jit(lambda xx, oo: jax.vmap(shift_s1)(xx, oo))
    s2 = jax.jit(lambda xx, oo: jax.vmap(shift_s2)(xx, oo))
    r0 = np.asarray(s0(xd[:4], od[:4]))
    for nm, fn in (("S1", s1), ("S2", s2)):
        rv = np.asarray(fn(xd[:4], od[:4]))
        print(f"{nm} bit-exact vs S0: {np.array_equal(rv, r0)}")

    for name, fn in (("S0_current", s0), ("S1_noconcat", s1),
                     ("S2_precision", s2)):
        def chained_s(f):
            @jax.jit
            def run(xx, oo):
                def body(c, _):
                    return f(c, oo), ()
                c, _ = jax.lax.scan(body, xx, None, length=8)
                return c
            return run
        try:
            t0 = time.perf_counter()
            ms, v = timeit(chained_s(fn), xd, od, iters=8)
            print(f"{name}: {ms / 8:.2f} ms/batch (compile+run "
                  f"{time.perf_counter() - t0:.0f}s)")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
