"""Probe: device time of the serving pipeline variants at 1M x 768.

VERDICT r3 #2 asks the certified serving device stage to approach the
>=100k QPS north star (<= 15.36 ms/1536-batch). The refined gather is
latency-bound (36-43 GB/s) and refine-fused-into-the-scan has no good TPU
shape (candidates are only known after the full pass; per-query VMEM
gathers don't vectorize), so the remaining lever is DROPPING work: select
the compact DD slice straight from the scan bounds (Engine:DirectSelect)
and let certificate misses pay the refine path instead of every query
paying it up front.

Variants (chained megastep, one readback, arrays as arguments):

  A  scan(sub,t) + merge + refine_select(r=64, t_out=32) + exact_cos
       — the round-3 serving device stage
  B  scan(sub,t) + merge + direct_select(t_out=32) + exact_cos
  C  B with t_out=16
  S  scan(sub,t) + merge alone (the floor)

across extraction layouts (sub, t) in {(512,2), (1024,1), (512,1)}.
Synthetic planes are generated ON DEVICE (the tunnel uploads at
10-50 MB/s; bench_10m's donated-buffer trick) — timing-equivalent to the
bench corpus, resolution is NOT measured here (the bench e2e owns that).

Run: PYTHONPATH=.:/root/.axon_site python -u tools/probe_direct_serve.py
"""

from __future__ import annotations

import contextlib
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np

import jax

# persistent compile cache (same as bench.py): the probe's ~13 megastep
# programs cost minutes EACH through the remote-compile service on a bad
# tunnel day; with the cache a re-run resumes where the last one stopped
with contextlib.suppress(Exception):
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("OMNI_JAX_CACHE", "/tmp/omni_jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from omni_recall_tpu.ops import exact_cos as ec
from omni_recall_tpu.ops import pallas_scorer as ps
from omni_recall_tpu.ops import refine as rf
from omni_recall_tpu.ops.merge import top_k_with_payload


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
    qps = 1536 / per * 1000.0
    print(f"{label:44s} {per:8.3f} ms/batch  {qps:9.0f} qps", flush=True)
    return per


def main() -> None:
    n, d, bt = 1 << 20, 768, 1536
    slab = 1 << 19

    import functools as ft

    @ft.partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4, 5, 6, 7))
    def fill(emb8, scale, err, emb2, scale2, err2, raw, created, key, start):
        f = jax.random.normal(key, (slab, d), dtype=jnp.float32)
        f = f / jnp.linalg.norm(f, axis=1, keepdims=True)
        absmax = jnp.max(jnp.abs(f), axis=1, keepdims=True)
        s1 = (absmax / 127.0)[:, 0]
        q1 = jnp.clip(jnp.round(f / (absmax / 127.0)), -127, 127).astype(jnp.int8)
        r1 = f - q1.astype(jnp.float32) * s1[:, None]
        e1 = jnp.linalg.norm(r1, axis=1) * 1.000001
        am2 = jnp.maximum(jnp.max(jnp.abs(r1), axis=1, keepdims=True), 1e-20)
        s2 = (am2 / 127.0)[:, 0]
        q2 = jnp.clip(jnp.round(r1 / (am2 / 127.0)), -127, 127).astype(jnp.int8)
        e2 = jnp.linalg.norm(r1 - q2.astype(jnp.float32) * s2[:, None], axis=1) * 1.000001
        cr = jnp.linspace(0.0, 365.0, slab, dtype=jnp.float32)
        upd = jax.lax.dynamic_update_slice
        return (
            upd(emb8, q1, (start, 0)), upd(scale, s1, (start,)),
            upd(err, e1, (start,)), upd(emb2, q2, (start, 0)),
            upd(scale2, s2, (start,)), upd(err2, e2, (start,)),
            upd(raw, f, (start, 0)), upd(created, cr, (start,)),
        )

    bufs = (
        jnp.zeros((n, d), jnp.int8), jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32), jnp.zeros((n, d), jnp.int8),
        jnp.zeros((n,), jnp.float32), jnp.zeros((n,), jnp.float32),
        jnp.zeros((n, d), jnp.float32), jnp.zeros((n,), jnp.float32),
    )
    key = jax.random.PRNGKey(0)
    for i in range(n // slab):
        bufs = fill(*bufs, jax.random.fold_in(key, i), jnp.int32(i * slab))
    emb8, scale, err, emb2, scale2, err2, raw, created = bufs
    w = 1024 // 8
    bloom = (
        jax.random.bits(jax.random.PRNGKey(9), (n, w), dtype=jnp.uint8)
        & jax.random.bits(jax.random.PRNGKey(10), (n, w), dtype=jnp.uint8)
    )
    valid = jnp.ones((n,), dtype=bool)

    q = jax.random.normal(jax.random.PRNGKey(3), (bt, d), dtype=jnp.float32)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    msk = jax.random.uniform(jax.random.PRNGKey(4), (bt, 1024)) < (40.0 / 1024)
    kw = jnp.where(msk, 0.025, 0.0).astype(jnp.float32)
    bias = jnp.zeros((bt,), dtype=jnp.float32)
    nowd = jnp.float32(365.0)
    r0 = jnp.int32(0)
    g, reps = 4, 2

    def scan(sub, t, e1, s1, er1, cr, va, qv, kv, bv):
        return ps.score_topm_int8_coarse(
            e1, s1, er1, cr, va, qv, kv, bv, nowd, r0,
            m=128, t=t, sub=sub,
        )

    import ast as _ast

    cfgs = _ast.literal_eval(
        os.environ.get("PROBE_CONFIGS", "((1024, 2), (512, 2), (1024, 1))")
    )
    for sub, t in cfgs:
        label = f"(sub={sub}, t={t})"

        def s_body(c, e1, s1, er1, cr, va, qv, kv, bv):
            qd = qv + 1e-12 * c[:, None]
            v, i = scan(sub, t, e1, s1, er1, cr, va, qd, kv, bv)
            return v[:, 0] + i[:, 0].astype(jnp.float32) * 1e-9

        args_s = (emb8, scale, err, created, valid, q, kw, bias)
        t_s = mega(s_body, jnp.zeros((bt,), jnp.float32), args_s, g, reps,
                   f"S  scan+merge {label}")

        def sk_body(c, e1, s1, er1, cr, va, qv, kv, bv):
            # packed single-i32 emit (Engine:PackedEmit): halves the
            # kernel's padded output writes; bit-identical decode
            qd = qv + 1e-12 * c[:, None]
            v, i = ps.score_topm_int8_coarse(
                e1, s1, er1, cr, va, qd, kv, bv, nowd, r0,
                m=128, t=t, sub=sub, emit_keys=True,
            )
            return v[:, 0] + i[:, 0].astype(jnp.float32) * 1e-9

        mega(sk_body, jnp.zeros((bt,), jnp.float32), args_s, g, reps,
             f"SK scan+merge packed-emit {label}")

        def a_body(c, e1, s1, er1, e2, s2, er2, bl, cr, va, rw, qv, kv, bv):
            qd = qv + 1e-12 * c[:, None]
            v, i = scan(sub, t, e1, s1, er1, cr, va, qd, kv, bv)
            rows, ubs, bound = rf.refine_select_from_scan(
                e1, s1, e2, s2, er2, bl, cr, va, qd, kv, bv, nowd,
                v, i, t_out=32, r=64,
            )
            hi, lo, sa = ec.exact_cos_rows(rw, rows, qd)
            return (ubs[:, 0] + bound + hi[:, 0] + lo[:, 0]
                    + sa[:, 0] * 1e-9 + rows[:, 0].astype(jnp.float32) * 1e-9)

        args_a = (emb8, scale, err, emb2, scale2, err2, bloom, created,
                  valid, raw, q, kw, bias)
        mega(a_body, jnp.zeros((bt,), jnp.float32), args_a, g, reps,
             f"A  refine_select(r=64)+DD {label}")

        for t_out in (32, 16):
            def b_body(c, e1, s1, er1, cr, va, rw, qv, kv, bv, t_out=t_out):
                qd = qv + 1e-12 * c[:, None]
                v, i = scan(sub, t, e1, s1, er1, cr, va, qd, kv, bv)
                rows, ubs, bound = rf.direct_select_from_scan(v, i, t_out)
                hi, lo, sa = ec.exact_cos_rows(rw, rows, qd)
                return (ubs[:, 0] + bound + hi[:, 0] + lo[:, 0]
                        + sa[:, 0] * 1e-9
                        + rows[:, 0].astype(jnp.float32) * 1e-9)

            args_b = (emb8, scale, err, created, valid, raw, q, kw, bias)
            mega(b_body, jnp.zeros((bt,), jnp.float32), args_b, g, reps,
                 f"B  direct_select(t_out={t_out})+DD {label}")

        if os.environ.get("PROBE_EMIT_T", "0") == "1":
            def st_body(c, e1, s1, er1, cr, va, qv, kv, bv):
                qd = qv + 1e-12 * c[:, None]
                v, i = ps.score_topm_int8_coarse(
                    e1, s1, er1, cr, va, qd, kv, bv, nowd, r0,
                    m=128, t=t, sub=sub, emit_keys="t",
                )
                return v[:, 0] + i[:, 0].astype(jnp.float32) * 1e-9
            mega(st_body, jnp.zeros((bt,), jnp.float32), args_s, g, reps,
                 f"T  scan+merge keys_t {label}")

            def bt_body(c, e1, s1, er1, cr, va, rw, qv, kv, bv):
                qd = qv + 1e-12 * c[:, None]
                v, i = ps.score_topm_int8_coarse(
                    e1, s1, er1, cr, va, qd, kv, bv, nowd, r0,
                    m=128, t=t, sub=sub, emit_keys="t",
                )
                rows, ubs, bound = rf.direct_select_from_scan(v, i, 32)
                hi, lo, sa = ec.exact_cos_rows(rw, rows, qd)
                return (ubs[:, 0] + bound + hi[:, 0] + lo[:, 0]
                        + sa[:, 0] * 1e-9
                        + rows[:, 0].astype(jnp.float32) * 1e-9)
            args_bt = (emb8, scale, err, created, valid, raw, q, kw, bias)
            mega(bt_body, jnp.zeros((bt,), jnp.float32), args_bt, g, reps,
                 f"BT direct_select(32)+DD keys_t {label}")

        if os.environ.get("PROBE_DECOMP", "0") != "1":
            continue
        # ---- decomposition of the select+DD overhead (VERDICT r4 #3):
        # where do the ~3 ms between "scan+merge" and the full serving
        # stage go? Variants isolate the merge width, the compact-slice
        # construction, the DD gather, and the TwoSum chain. ----
        for m_ in (33, 64):
            def m_body(c, e1, s1, er1, cr, va, qv, kv, bv, m_=m_):
                qd = qv + 1e-12 * c[:, None]
                v, i = ps.score_topm_int8_coarse(
                    e1, s1, er1, cr, va, qd, kv, bv, nowd, r0,
                    m=m_, t=t, sub=sub,
                )
                return v[:, 0] + i[:, 0].astype(jnp.float32) * 1e-9
            mega(m_body, jnp.zeros((bt,), jnp.float32), args_s, g, reps,
                 f"Sm scan+merge(m={m_}) {label}")

        def bn_body(c, e1, s1, er1, cr, va, qv, kv, bv):
            qd = qv + 1e-12 * c[:, None]
            v, i = scan(sub, t, e1, s1, er1, cr, va, qd, kv, bv)
            rows, ubs, bound = rf.direct_select_from_scan(v, i, 32)
            return (ubs[:, 0] + bound
                    + rows[:, 0].astype(jnp.float32) * 1e-9)
        mega(bn_body, jnp.zeros((bt,), jnp.float32), args_s, g, reps,
             f"Bn direct_select(32), no DD {label}")

        def bg_body(c, e1, s1, er1, cr, va, rw, qv, kv, bv):
            qd = qv + 1e-12 * c[:, None]
            v, i = scan(sub, t, e1, s1, er1, cr, va, qd, kv, bv)
            rows, ubs, bound = rf.direct_select_from_scan(v, i, 32)
            gth = jnp.take(rw, jnp.maximum(rows, 0), axis=0)
            return (ubs[:, 0] + bound + gth[:, 0, 0]
                    + rows[:, 0].astype(jnp.float32) * 1e-9)
        args_g = (emb8, scale, err, created, valid, raw, q, kw, bias)
        mega(bg_body, jnp.zeros((bt,), jnp.float32), args_g, g, reps,
             f"Bg + DD gather only (sum) {label}")

        def b33_body(c, e1, s1, er1, cr, va, rw, qv, kv, bv):
            qd = qv + 1e-12 * c[:, None]
            v, i = ps.score_topm_int8_coarse(
                e1, s1, er1, cr, va, qd, kv, bv, nowd, r0,
                m=33, t=t, sub=sub,
            )
            rows, ubs, bound = rf.direct_select_from_scan(v, i, 32)
            hi, lo, sa = ec.exact_cos_rows(rw, rows, qd)
            return (ubs[:, 0] + bound + hi[:, 0] + lo[:, 0]
                    + sa[:, 0] * 1e-9
                    + rows[:, 0].astype(jnp.float32) * 1e-9)
        mega(b33_body, jnp.zeros((bt,), jnp.float32), args_g, g, reps,
             f"B33 merge(m=33)+direct_select(32)+DD {label}")


if __name__ == "__main__":
    main()
