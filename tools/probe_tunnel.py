"""Probe the dev tunnel's transport characteristics + refine-stage cost.

Measures (on the real chip through the tunnel):
- H2D bandwidth at serving-relevant sizes (query operands: 0.8-12 MB)
- D2H readback bandwidth/latency at candidate-slice sizes (0.05-2 MB)
- per-dispatch RPC latency (tiny no-op jit)
- refine_select_from_scan cost at 1M x 768 via chained megasteps

These numbers size the pipelined serving measurement in bench.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend())


def timeit(fn, reps=5, warm=2):
    for _ in range(warm):
        fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps


# --- H2D ---
for mb in (0.75, 3.0, 6.0, 12.0):
    nbytes = int(mb * 1e6)
    host = np.random.default_rng(0).integers(0, 255, size=nbytes, dtype=np.uint8)

    def h2d():
        a = jnp.asarray(host)
        a.block_until_ready()

    s = timeit(h2d, reps=3, warm=1)
    print(f"h2d {mb:5.2f} MB: {s*1000:8.1f} ms  ({mb/s:6.1f} MB/s)")

# --- D2H ---
dev_big = jnp.zeros((2_000_000,), dtype=jnp.uint8) + 1
jax.block_until_ready(dev_big)
for mb in (0.05, 0.4, 0.8, 2.0):
    n = int(mb * 1e6)
    sl = dev_big[:n]
    jax.block_until_ready(sl)

    def d2h():
        _ = np.asarray(sl)

    s = timeit(d2h, reps=3, warm=1)
    print(f"d2h {mb:5.2f} MB: {s*1000:8.1f} ms  ({mb/s:6.1f} MB/s)")

# --- dispatch latency ---
f = jax.jit(lambda x: x + 1)
x = jnp.zeros((8,), jnp.float32)
x = f(x)
jax.block_until_ready(x)


def dispatch_sync():
    jax.block_until_ready(f(x))


print(f"tiny dispatch+sync: {timeit(dispatch_sync, reps=10)*1000:.1f} ms")


def dispatch_async10():
    y = x
    for _ in range(10):
        y = f(y)
    jax.block_until_ready(y)


print(f"10 chained dispatch+1 sync: {timeit(dispatch_async10, reps=5)*1000:.1f} ms")

# --- refine stage at 1M x 768 int8 (+ residual plane + bloom) ---
n, d, w, m, t_out = 1 << 20, 768, 64, 128, 32
key = jax.random.PRNGKey(0)


@jax.jit
def gen(key):
    f32 = jax.random.normal(key, (n, d), dtype=jnp.float32)
    f32 = f32 / jnp.linalg.norm(f32, axis=1, keepdims=True)
    am1 = jnp.max(jnp.abs(f32), axis=1, keepdims=True)
    s1 = am1 / 127.0
    q1 = jnp.clip(jnp.round(f32 / s1), -127, 127).astype(jnp.int8)
    r = f32 - q1.astype(jnp.float32) * s1
    am2 = jnp.max(jnp.abs(r), axis=1, keepdims=True)
    s2 = jnp.where(am2 > 0, am2, 1.0) / 127.0
    q2 = jnp.clip(jnp.round(r / s2), -127, 127).astype(jnp.int8)
    err2 = jnp.linalg.norm(r - q2.astype(jnp.float32) * s2, axis=1) * 1.0001
    return q1, s1[:, 0], q2, s2[:, 0], err2


emb1, s1, emb2, s2, err2 = gen(key)
bloom = jax.random.bits(key, (n, w), dtype=jnp.uint8)
created = jnp.linspace(0.0, 365.0, n, dtype=jnp.float32)
valid = jnp.ones((n,), dtype=bool)
jax.block_until_ready(emb2)

from omni_recall_tpu.ops import refine  # noqa: E402

for b in (448, 1536):
    qk = jax.random.normal(jax.random.PRNGKey(1), (b, d), dtype=jnp.float32)
    qk = qk / jnp.linalg.norm(qk, axis=1, keepdims=True)
    kw_w = (jax.random.uniform(jax.random.PRNGKey(2), (b, w * 8)) < 0.04).astype(
        jnp.float32
    ) * 0.025
    kw_b = jnp.zeros((b,), jnp.float32)
    rows = jax.random.randint(jax.random.PRNGKey(3), (b, m + 1), 0, n, dtype=jnp.int32)
    vals = jnp.zeros((b, m + 1), jnp.float32)

    # planes/queries passed as ARGUMENTS (a pytree), never closed over:
    # closures bake them into the executable as XLA constants (CLAUDE.md)
    plane_args = (emb1, s1, emb2, s2, err2, bloom, created, valid,
                  qk, kw_w, kw_b, vals)

    @jax.jit
    def mega(carry, rows, planes):
        p_emb1, p_s1, p_emb2, p_s2, p_err2, p_bloom, p_created, p_valid, \
            p_qk, p_kw_w, p_kw_b, p_vals = planes

        def body(c, _):
            r = jnp.clip(rows + c.astype(jnp.int32)[:, None], 0, n - 1)
            ro, ub, bound = refine.refine_select_from_scan(
                p_emb1, p_s1, p_emb2, p_s2, p_err2, p_bloom, p_created,
                p_valid, p_qk, p_kw_w, p_kw_b, jnp.float32(365.0), p_vals,
                r, t_out=t_out,
            )
            return ub[:, 0] + ro[:, 0].astype(jnp.float32) * 1e-9, None
        c, _ = jax.lax.scan(body, carry, jnp.arange(4))
        return c

    carry = jnp.zeros((b,), jnp.float32)
    carry = mega(carry, rows, plane_args)
    jax.block_until_ready(carry)

    def run():
        c = mega(jnp.zeros((b,), jnp.float32), rows, plane_args)
        jax.block_until_ready(c)

    s = timeit(run, reps=3, warm=1)
    print(f"refine_select B={b}: {s/4*1000:.2f} ms/batch "
          f"({b/(s/4):,.0f} queries/s)")
