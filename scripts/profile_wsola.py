"""One profiled look at the device WSOLA pitch stage (round-4 verdict
item 8): is the ~22-step `lax.scan` carry or the per-segment work the
reason WSOLA (3.9 ms per (8, 20480) batch) runs ~11% behind the vocoder
it replaced (3.5 ms)?

Method: time the production kernel against two ablations that keep its
exact op mix but remove one structural property each —

  * `no-search` — the cross-correlation + argmax is replaced by "take the
    natural position" (best = want). Same scan, same slices/concat/blend;
    the delta is the per-segment search cost.
  * `no-carry`  — every scan step runs with a surrogate tail sliced at
    its own natural position instead of the true carried tail (WRONG
    output, same op count/shapes, no sequential dependence: the steps
    become a parallel vmap). The delta is the cost of serializing the
    ~19-step chain.

Also times the full `pitch_wsola` (stretch + resample) and the quick
vocoder for the anchor numbers.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_wsola.py
"""

import math
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])

import jax
import jax.numpy as jnp

from cpc2_tpu.data import augment_device as ad

B, W = 8, 20480
SHIFT_MAX = 300
REPS = 40


def timed(fn, *args):
    out = fn(*args)
    np.asarray(out).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    np.asarray(out).ravel()[0]
    return 1000.0 * (time.perf_counter() - t0) / REPS


def _stretch_variant(x, out_len, max_out_len, search_on, carry_on):
    """`_wsola_stretch_dev` with the search and/or the carry ablated;
    mirrors the production kernel's shapes and op mix exactly."""
    w = x.shape[0]
    seg, ovr, search, hop = ad._WS_SEG, ad._WS_OVR, ad._WS_SEARCH, ad._WS_HOP
    n_steps = -(-max_out_len // hop)
    ramp = jnp.linspace(0.0, 1.0, ovr).astype(x.dtype)
    xp = jnp.pad(x, (search, seg + search))

    def body(tail, i):
        pos = i * hop
        want = ad._round_ratio(pos * w, out_len)
        if search_on:
            lo = jnp.maximum(0, want - search)
            hi = jnp.minimum(w - seg, want + search)
            s = jax.lax.dynamic_slice(xp, (want,), (2 * search + ovr,))
            scores = jnp.correlate(s, tail, mode='valid',
                                   precision=jax.lax.Precision.HIGHEST)
            p = want - search + jnp.arange(2 * search + 1)
            j = jnp.argmax(jnp.where((p >= lo) & (p <= hi), scores,
                                     -jnp.inf))
            best = jnp.where((want + seg > w) | (i == 0), want,
                             want - search + j)
        else:
            best = want
        chunk = jax.lax.dynamic_slice(xp, (best + search,), (seg,))
        blend = jnp.where(i == 0, chunk[:ovr],
                          tail * (1 - ramp) + chunk[:ovr] * ramp)
        return chunk[hop:], jnp.concatenate([blend, chunk[ovr:hop]])

    if carry_on:
        _, rows = jax.lax.scan(body, jnp.zeros(ovr, x.dtype),
                               jnp.arange(n_steps))
    else:
        # surrogate tail at each step's own natural position — same ops,
        # no dependence between steps (output is WRONG; timing-only)
        def body_par(i):
            pos = i * hop
            want = ad._round_ratio(pos * w, out_len)
            tail = jax.lax.dynamic_slice(xp, (want + search,), (ovr,))
            return body(tail, i)[1]
        rows = jax.vmap(body_par)(jnp.arange(n_steps))
    return rows.reshape(-1)


def make_batch_fn(search_on, carry_on):
    max_factor = 2.0 ** (SHIFT_MAX / 1200.0)
    max_out = int(math.ceil(W * max_factor)) + 1

    @jax.jit
    def run(x, cents):
        def one(xi, ci):
            factor = 2.0 ** (ci / 1200.0)
            out_len = jnp.round(W * factor).astype(jnp.int32)
            return _stretch_variant(xi, out_len, max_out, search_on,
                                    carry_on)
        return jax.vmap(one)(x, cents)
    return run


def main():
    print(f"backend: {jax.default_backend()}")
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(B, W).astype(np.float32) * 0.1)
    key = jax.random.PRNGKey(0)
    cents = jax.random.randint(jax.random.PRNGKey(1), (B,), -SHIFT_MAX,
                               SHIFT_MAX).astype(jnp.float32)

    full_pitch = timed(jax.jit(lambda a, k: ad.pitch_wsola(a, k)), x, key)
    vocoder = timed(jax.jit(lambda a, k: ad.pitch(a, k)), x, key)
    quick = timed(jax.jit(lambda a, k: ad.pitch_quick(a, k)), x, key)

    base = timed(make_batch_fn(True, True), x, cents)
    nosearch = timed(make_batch_fn(False, True), x, cents)
    nocarry = timed(make_batch_fn(True, False), x, cents)

    print(f"pitch_wsola (stretch+resample, production): {full_pitch:.2f} ms")
    print(f"vocoder anchor (pitch):                     {vocoder:.2f} ms")
    print(f"quick vocoder (pitch_quick):                {quick:.2f} ms")
    print(f"stretch kernel, production form:            {base:.2f} ms")
    print(f"  - search ablated (scan+slices only):      {nosearch:.2f} ms "
          f"(search cost {base - nosearch:.2f})")
    print(f"  - carry ablated (parallel vmap, same ops):{nocarry:.2f} ms "
          f"(serialization cost {base - nocarry:.2f})")
    import json
    print(json.dumps({'pitch_wsola_ms': full_pitch, 'vocoder_ms': vocoder,
                      'quick_ms': quick, 'stretch_ms': base,
                      'no_search_ms': nosearch, 'no_carry_ms': nocarry}))


if __name__ == '__main__':
    main()
