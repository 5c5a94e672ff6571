#!/usr/bin/env python
"""On-chip tuning sweep for the coarse int8 scan kernel.

Times block_topt_int8_coarse over (batch, block, sub) configs at 1M x 768
using the chained-megastep protocol (see bench.py docstring for why). Prints
one line per config.
"""

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from omni_recall_tpu.ops import merge, pallas_scorer

N = int(os.environ.get("SWEEP_N", 1 << 20))
D = 768
G = int(os.environ.get("SWEEP_G", 6))
STEPS = int(os.environ.get("SWEEP_STEPS", 2))


def run(b, block, sub, emb8, r_scale, add_row):
    key = jax.random.PRNGKey(b)
    q_all = jax.random.normal(key, (G, b, D), dtype=jnp.float32)
    q_all = q_all / jnp.linalg.norm(q_all, axis=-1, keepdims=True)

    @functools.partial(jax.jit, static_argnames=("block", "sub"))
    def megastep(carry, emb8, r_scale, add_row, q_all, block, sub):
        def body(c, q):
            q = q + 1e-12 * c[:, None]
            q8, q_scale, eq = pallas_scorer.quantize_queries_int8(q)
            q_bias = 0.7 * eq + 0.2
            vals, idxs = pallas_scorer.block_topt_int8_coarse(
                emb8, q8, add_row, r_scale[None, :], q_scale, q_bias,
                t=1, sub=sub, block=block,
            )
            bb, nb, t1 = vals.shape
            cand_v = vals[:, :, : t1 - 1].reshape(bb, -1)
            cand_i = idxs[:, :, : t1 - 1].reshape(bb, -1)
            merge_mode = os.environ.get("SWEEP_MERGE", "topk")
            if merge_mode == "approx":
                top_v, pos = jax.lax.approx_max_k(cand_v, 128, recall_target=1.0)
                top_i = jnp.take_along_axis(cand_i, pos, axis=1)
            elif merge_mode == "none":
                top_v = jnp.max(cand_v, axis=1, keepdims=True)
                top_i = jnp.argmax(cand_i, axis=1, keepdims=True).astype(jnp.int32)
            else:
                top_v, top_i = merge.top_k_with_payload(cand_v, cand_i, 128)
            new_c = top_v[:, 0] + top_i[:, 0].astype(jnp.float32) * 1e-9
            return new_c, None
        carry, _ = jax.lax.scan(body, carry, q_all)
        return carry

    carry = jnp.zeros((b,), dtype=jnp.float32)
    carry = megastep(carry, emb8, r_scale, add_row, q_all, block, sub)
    _ = np.asarray(carry[:2])
    t0 = time.perf_counter()
    c = carry
    for _ in range(STEPS):
        c = megastep(c, emb8, r_scale, add_row, q_all, block, sub)
    _ = np.asarray(c[:2])
    dt = time.perf_counter() - t0
    scans = G * STEPS
    print(f"B={b:4d} block={block:5d} sub={sub:4d}  "
          f"scan={dt / scans * 1000:7.3f} ms  qps={b * scans / dt:9.1f}",
          flush=True)


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

    import itertools
    bs = [int(x) for x in os.environ.get("SWEEP_B", "448,512,768,1024").split(",")]
    blocks = [int(x) for x in os.environ.get("SWEEP_BLOCK", "1024,2048").split(",")]
    subs = [int(x) for x in os.environ.get("SWEEP_SUB", "512,1024").split(",")]
    for b in bs:
        for block in blocks:
            for sub in subs:
                if sub > block:
                    continue
                try:
                    run(b, block, sub, emb8, r_scale, add_row)
                except Exception as e:
                    print(f"B={b} block={block} sub={sub} FAILED: {e}", flush=True)


if __name__ == "__main__":
    main()
