"""Probe: does index order change the refine candidate-gather rate?

STATUS_R3 "known limits": the refine stage's candidate-row gather runs at
~36-43 GB/s regardless of plane layout (latency-bound row gather), and
beating it likely needs a different access pattern. The cheapest candidate
is SORTING the flat [B*m] candidate indices before the gather (HBM-
sequential-ish fetches) and un-permuting the gathered slab on device —
bit-identical results since it is a pure permutation.

This probe times, with the chained-megastep methodology of
tools/probe_sharded_timing.py (one readback per G-step jit):

  R  — jnp.take of [B*m] RANDOM flat rows from the two int8 planes, the
       bloom plane at the DEFAULT config width (bloom_bits=2048 -> 256
       B/row), and the [N,5] f32 sidecar refine_ub also gathers — the
       refine stage's per-row gather traffic at the default config
  S  — the same take with the indices PRE-SORTED (upper bound on any
       sort-based win: sort/unpermute costs excluded)
  SF — sorted gather INCLUDING on-device argsort + inverse-permutation
       of the gathered slabs (the real end-to-end candidate)

If S ~= R the gather does not care about index order and the idea is dead.

Run on the real chip: PYTHONPATH=. python -u tools/probe_gather_sorted.py
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp


def _time_mega(fn, args, G, reps=3):
    j = jax.jit(fn)
    out = j(*args)
    _ = np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = j(*args)
        _ = np.asarray(out)
    return (time.perf_counter() - t0) / reps / G * 1000.0


def main() -> None:
    n, d, w, w5 = 1 << 19, 768, 256, 5
    b, m = 1536, 64
    bm = b * m
    G = 8

    key = jax.random.PRNGKey(0)
    emb1 = jax.random.bits(key, (n, d), dtype=jnp.uint8).astype(jnp.int8)
    emb2 = jax.random.bits(
        jax.random.PRNGKey(1), (n, d), dtype=jnp.uint8
    ).astype(jnp.int8)
    bloom = jax.random.bits(jax.random.PRNGKey(2), (n, w), dtype=jnp.uint8)
    side = jax.random.normal(jax.random.PRNGKey(3), (n, w5), jnp.float32)

    rng = np.random.default_rng(0)
    idx_r = jnp.asarray(rng.integers(0, n, size=(bm,), dtype=np.int32))
    idx_s = jnp.sort(idx_r)

    bytes_per = bm * (2 * d + w + 4 * w5)

    def gathers(idx, g1, g2, gb, gs):
        # checksum keeps all four gathers live; idx data-depends on the
        # carry so lax.scan cannot hoist the gather out of the loop
        a = jnp.take(g1, idx, axis=0)
        bq = jnp.take(g2, idx, axis=0)
        c = jnp.take(gb, idx, axis=0)
        sd = jnp.take(gs, idx, axis=0)
        return (
            a.astype(jnp.int32).sum()
            + bq.astype(jnp.int32).sum()
            + c.astype(jnp.int32).sum()
            + sd.sum().astype(jnp.int32)
        )

    # the anti-hoist dependency rides a TRACED zero scalar (a jit
    # argument): `idx0 + (carry & zero)` is value-identical to idx0 but
    # XLA cannot prove it constant, so the gather provably depends on the
    # loop carry. (The previous `c % 1` construct relied on the algebraic
    # simplifier NOT folding integer x % 1 -> 0 — fragile across XLA
    # versions; ADVICE r3.)
    def mega_plain(idx0, zero, g1, g2, gb, gs):
        def step(c, _):
            idx = idx0 + (c & zero)  # data dependency, value-identical
            s = gathers(idx, g1, g2, gb, gs)
            return s, s
        _, outs = jax.lax.scan(step, jnp.int32(0), xs=None, length=G)
        return outs

    def mega_full(idx0, zero, g1, g2, gb, gs):
        # end-to-end sorted variant: argsort + sorted gather + un-permute
        def step(c, _):
            idx = idx0 + (c & zero)
            order = jnp.argsort(idx)
            srt = jnp.take(idx, order)
            a = jnp.take(g1, srt, axis=0)
            bq = jnp.take(g2, srt, axis=0)
            cb = jnp.take(gb, srt, axis=0)
            sd = jnp.take(gs, srt, axis=0)
            inv = jnp.zeros_like(order).at[order].set(
                jnp.arange(bm, dtype=order.dtype)
            )
            a = jnp.take(a, inv, axis=0)
            bq = jnp.take(bq, inv, axis=0)
            cb = jnp.take(cb, inv, axis=0)
            sd = jnp.take(sd, inv, axis=0)
            s = (
                a.astype(jnp.int32).sum()
                + bq.astype(jnp.int32).sum()
                + cb.astype(jnp.int32).sum()
                + sd.sum().astype(jnp.int32)
            )
            return s, s
        _, outs = jax.lax.scan(step, jnp.int32(0), xs=None, length=G)
        return outs

    zero = jnp.int32(0)
    ms_r = _time_mega(mega_plain, (idx_r, zero, emb1, emb2, bloom, side), G)
    print(f"R : random gather      {ms_r:8.3f} ms  "
          f"{bytes_per / ms_r / 1e6:7.1f} GB/s")
    ms_s = _time_mega(mega_plain, (idx_s, zero, emb1, emb2, bloom, side), G)
    print(f"S : sorted gather      {ms_s:8.3f} ms  "
          f"{bytes_per / ms_s / 1e6:7.1f} GB/s")
    if ms_s < 0.85 * ms_r:
        ms_sf = _time_mega(mega_full, (idx_r, zero, emb1, emb2, bloom, side), G)
        print(f"SF: sort+gather+unperm {ms_sf:8.3f} ms  "
              f"{bytes_per / ms_sf / 1e6:7.1f} GB/s")
    else:
        print("S ~= R: gather is order-insensitive; sort idea dead")


if __name__ == "__main__":
    main()
