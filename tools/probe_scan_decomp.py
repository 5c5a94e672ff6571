"""Probe: decompose score_topm_int8_coarse at serving shapes.

probe_serve measured S(scan)=59.2 ms/batch at (1M, 768, bt=1536, t=4,
sub=1024) while probe_pipe's raw pipelined block scan measured 15.7 ms.
This probe times each stage of the wrapper to find the other ~44 ms:

  B1  block_topt_int8_coarse (production dispatch: re-block -> pipelined)
  B2  block_topt_int8_coarse with block=2048 forced (baseline kernel)
  A   make_add_row alone ([1, N] elementwise over 1M)
  M   _merge_topm alone ([bt, 5120] -> top-129)
  F   full score_topm_int8_coarse

Run: PYTHONPATH=.:/root/.axon_site python -u tools/probe_scan_decomp.py
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

from omni_recall_tpu.ops import pallas_scorer


def mega(body, carry0, args, g, reps, label):
    @jax.jit
    def run(carry, *a):
        def step(c, _):
            return body(c, *a), None

        carry, _ = jax.lax.scan(step, carry, xs=None, length=g)
        return carry

    c = run(carry0, *args)
    _ = np.asarray(c[:2])
    t0 = time.perf_counter()
    for _ in range(reps):
        c = run(c, *args)
    _ = np.asarray(c[:2])
    per = (time.perf_counter() - t0) / (g * reps) * 1000.0
    print(f"{label:52s} {per:9.3f} ms/batch", flush=True)
    return per


def main() -> None:
    n, d, bt, m, t, sub = 1 << 20, 768, 1536, 128, 4, 1024
    key = jax.random.PRNGKey(0)
    k1, _k2 = jax.random.split(key)
    emb1 = jax.random.randint(k1, (n, d), -127, 128, dtype=jnp.int32).astype(jnp.int8)
    scale1 = jnp.full((n,), 1.0 / 127.0 / np.sqrt(d), jnp.float32)
    err1 = jnp.full((n,), 8e-3, jnp.float32)
    created = jnp.linspace(0.0, 365.0, n, dtype=jnp.float32)
    valid = jnp.ones((n,), dtype=bool)
    now1 = jnp.float32(365.0)

    rng = np.random.default_rng(0)
    q = rng.standard_normal((bt, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q = jnp.asarray(q)
    kw = jnp.asarray((rng.uniform(size=(bt, 1024)) < 0.04).astype(np.float32) * 0.025)
    bias = jnp.zeros((bt,), jnp.float32)

    q8, q_scale, eq, err_term = pallas_scorer.prepare_int8_query(q, err1)
    add_row = pallas_scorer.make_add_row(created, valid, now1, jnp.int32(0),
                                         err_term=err_term)
    q_bias = pallas_scorer.coarse_q_bias(eq, kw, bias)
    g, reps = 4, 2

    # B: block scan at serving layouts (production re-blocks c to 1024 at
    # throughput batches; block=2048 with t=4 OOMs scoped VMEM)
    for sub_i, t_i in ((1024, 4), (512, 4), (512, 2), (1024, 2), (256, 1),
                       (512, 1), (1024, 1)):
        def b_body(c, e, ar, sr, q8v, qs, qb, sub_i=sub_i, t_i=t_i):
            qs = qs + 1e-12 * c[:, None]
            vals, idxs = pallas_scorer.block_topt_int8_coarse(
                e, q8v, ar, sr, qs, qb, t=t_i, sub=sub_i,
            )
            return c * 0 + vals[:, 0, 0] + idxs[:, 0, 0].astype(jnp.float32) * 1e-9

        mega(b_body, jnp.zeros((bt,), jnp.float32),
             (emb1, add_row, scale1[None, :], q8, q_scale, q_bias),
             g, reps, f"B  block_topt sub={sub_i} t={t_i}")

    # A: add_row alone
    def a_body(c, cr, va, et):
        et = et + 1e-12 * c[:1]
        ar = pallas_scorer.make_add_row(cr, va, now1, jnp.int32(0), err_term=et)
        return c * 0 + ar[0, :bt]

    mega(a_body, jnp.zeros((bt,), jnp.float32), (created, valid, err_term),
         g, reps, "A  make_add_row alone")

    # Q: prepare_int8_query + coarse_q_bias
    def q_body(c, qv, kwv, bv):
        qv = qv + 1e-12 * c[:, None]
        q8v, qsv, eqv, etv = pallas_scorer.prepare_int8_query(qv, err1)
        qbv = pallas_scorer.coarse_q_bias(eqv, kwv, bv)
        return c * 0 + qsv[:, 0] + qbv[:, 0] + q8v[:, 0].astype(jnp.float32) + etv[:bt]

    mega(q_body, jnp.zeros((bt,), jnp.float32), (q, kw, bias),
         g, reps, "Q  prepare_int8_query + coarse_q_bias")

    # M: merge alone on representative emitted shapes [bt, 1024, 5]
    vals0, idxs0 = pallas_scorer.block_topt_int8_coarse(
        emb1, q8, add_row, scale1[None, :], q_scale, q_bias, t=t, sub=sub,
    )
    print(f"emitted shape: {vals0.shape}", flush=True)

    @jax.jit
    def merge_j(v, i):
        return pallas_scorer._merge_topm(v, i, m)

    def m_body(c, v, i):
        v = v + 1e-12 * c[:, None, None]
        ov, oi = merge_j(v, i)
        return c * 0 + ov[:, 0] + oi[:, 0].astype(jnp.float32) * 1e-9

    mega(m_body, jnp.zeros((bt,), jnp.float32), (vals0, idxs0),
         g, reps, "M  _merge_topm alone")

    # F: full wrapper
    def f_body(c, e, s1, er, cr, va, qv, kwv, bv):
        qv = qv + 1e-12 * c[:, None]
        vals, idxs = pallas_scorer.score_topm_int8_coarse(
            e, s1, er, cr, va, qv, kwv, bv, now1, jnp.int32(0),
            m=m, t=t, sub=sub,
        )
        return c * 0 + vals[:, 0] + idxs[:, 0].astype(jnp.float32) * 1e-9

    mega(f_body, jnp.zeros((bt,), jnp.float32),
         (emb1, scale1, err1, created, valid, q, kw, bias),
         g, reps, "F  score_topm_int8_coarse full")


if __name__ == "__main__":
    main()
