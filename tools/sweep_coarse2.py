#!/usr/bin/env python
"""Isolate the coarse-scan fixed cost: kernel-only vs kernel+merge timing,
plus an int4 vs int8 MXU rate probe."""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from omni_recall_tpu.ops import pallas_scorer

N, D, G, STEPS = 1 << 20, 768, 6, 2


def time_fn(step, carry, *args):
    carry = step(carry, *args)
    _ = np.asarray(carry[:2])
    t0 = time.perf_counter()
    c = carry
    for _ in range(STEPS):
        c = step(c, *args)
    _ = np.asarray(c[:2])
    return (time.perf_counter() - t0) / (G * STEPS)


def main():
    key = jax.random.PRNGKey(0)
    emb_f = jax.random.normal(key, (N, D), dtype=jnp.float32)
    emb_f = emb_f / jnp.linalg.norm(emb_f, axis=1, keepdims=True)
    absmax = jnp.max(jnp.abs(emb_f), axis=1, keepdims=True)
    r_scale = (absmax / 127.0)[:, 0]
    emb8 = jnp.clip(jnp.round(emb_f / (absmax / 127.0)), -127, 127).astype(jnp.int8)
    del emb_f
    created = jnp.linspace(0.0, 365.0, N, dtype=jnp.float32)
    valid = jnp.ones((N,), dtype=bool)
    add_row = pallas_scorer.make_add_row(created, valid, jnp.float32(365.0), jnp.int32(0))

    b, block, sub = 768, 2048, 1024
    q_all = jax.random.normal(jax.random.PRNGKey(1), (G, b, D), dtype=jnp.float32)
    q_all = q_all / jnp.linalg.norm(q_all, axis=-1, keepdims=True)

    def scan_body(q):
        q8, q_scale, eq = pallas_scorer.quantize_queries_int8(q)
        q_bias = 0.7 * eq + 0.2
        return pallas_scorer.block_topt_int8_coarse(
            emb8, q8, add_row, r_scale[None, :], q_scale, q_bias,
            t=1, sub=sub, block=block,
        )

    @jax.jit
    def step_with_merge(carry, q_all):
        def body(c, q):
            q = q + 1e-12 * c[:, None]
            vals, idxs = scan_body(q)
            bb, nb, t1 = vals.shape
            cand_v = vals[:, :, : t1 - 1].reshape(bb, -1)
            cand_i = idxs[:, :, : t1 - 1].reshape(bb, -1)
            top_v, pos = jax.lax.top_k(cand_v, 128)
            top_i = jnp.take_along_axis(cand_i, pos, axis=1)
            return top_v[:, 0] + top_i[:, 0].astype(jnp.float32) * 1e-9, None
        carry, _ = jax.lax.scan(body, carry, q_all)
        return carry

    @jax.jit
    def step_kernel_only(carry, q_all):
        def body(c, q):
            q = q + 1e-12 * c[:, None]
            vals, idxs = scan_body(q)
            return jnp.max(vals, axis=(1, 2)) + c * 1e-12, None
        carry, _ = jax.lax.scan(body, carry, q_all)
        return carry

    carry = jnp.zeros((b,), dtype=jnp.float32)
    t_merge = time_fn(step_with_merge, carry, q_all)
    t_kernel = time_fn(step_kernel_only, carry, q_all)
    print(f"kernel+merge: {t_merge * 1000:7.3f} ms  ({b / t_merge:9.1f} qps)", flush=True)
    print(f"kernel only : {t_kernel * 1000:7.3f} ms  ({b / t_kernel:9.1f} qps)", flush=True)

    # int4 vs int8 MXU probe (XLA dot_general, [B, D] x [D, C] repeated)
    c_cols = 1 << 17
    w8 = jnp.asarray(
        np.random.default_rng(0).integers(-7, 8, size=(D, c_cols), dtype=np.int8)
    )
    x8 = jnp.asarray(
        np.random.default_rng(1).integers(-7, 8, size=(b, D), dtype=np.int8)
    )
    for name, w, x in (
        ("int8", w8, x8),
        ("int4", w8.astype(jnp.int4), x8.astype(jnp.int4)),
    ):
        @jax.jit
        def rep(carry, w=w, x=x):
            def body(c, _):
                out = jax.lax.dot_general(
                    x + c[:1, :1].astype(x.dtype), w,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                return out[:2, :2] + 0 * c, None
            c0 = jnp.zeros((2, 2), dtype=jnp.int32)
            c, _ = jax.lax.scan(body, c0, jnp.arange(8))
            return c
        try:
            r = rep(jnp.zeros((2, 2), jnp.int32))
            _ = np.asarray(r)
            t0 = time.perf_counter()
            for _ in range(3):
                r = rep(r)
            _ = np.asarray(r)
            dt = (time.perf_counter() - t0) / (3 * 8)
            tops = 2 * b * D * c_cols / dt / 1e12
            print(f"dot {name}: {dt * 1000:7.3f} ms -> {tops:6.1f} TOPS", flush=True)
        except Exception as e:
            print(f"dot {name} failed: {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
