"""Decompose the serving device stage (coarse scan + merge + refine/select).

Times each sub-stage with chained megasteps + one tiny readback (the tunnel's
per-dispatch RPC makes per-call timing meaningless — see CLAUDE.md). Run on
the real chip:

    python tools/profile_refine.py [--n 1048576] [--b 1536]
"""

from __future__ import annotations

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from omni_recall_tpu.ops import refine as refine_mod
from omni_recall_tpu.ops import pallas_scorer
from omni_recall_tpu.ops.merge import top_k_with_payload


def timeit(fn, carry, args, g, steps, label):
    c = fn(carry, *args)
    _ = np.asarray(c[:2])
    t0 = time.perf_counter()
    for _ in range(steps):
        c = fn(c, *args)
    _ = np.asarray(c[:2])
    per = (time.perf_counter() - t0) / (g * steps)
    print(f"{label:42s} {per * 1000.0:8.3f} ms/batch")
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--b", type=int, default=1536)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--bits", type=int, default=1024)
    ap.add_argument("--m", type=int, default=128)
    args_ns = ap.parse_args()
    n, b, d, bits, m = args_ns.n, args_ns.b, args_ns.d, args_ns.bits, args_ns.m
    w = bits // 8

    rng = np.random.default_rng(0)
    emb = rng.standard_normal((n, d), dtype=np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    from omni_recall_tpu.ops.quantize import (
        quantize_rows_int8,
        quantize_rows_int8_residual,
    )

    e1, s1, err1 = quantize_rows_int8(emb)
    _, _, _, e2, s2, err2 = quantize_rows_int8_residual(emb)
    bloom = rng.integers(0, 256, size=(n, w), dtype=np.uint8)
    created = np.zeros(n, dtype=np.float32)
    valid = np.ones(n, dtype=bool)
    q = rng.standard_normal((b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    kw_w = np.abs(rng.standard_normal((b, bits)).astype(np.float32)) * 0.01
    kw_bias = np.zeros(b, dtype=np.float32)

    dev = {
        "e1": jnp.asarray(e1), "s1": jnp.asarray(s1), "err1": jnp.asarray(err1),
        "e2": jnp.asarray(e2), "s2": jnp.asarray(s2), "err2": jnp.asarray(err2),
        "bloom": jnp.asarray(bloom), "created": jnp.asarray(created),
        "valid": jnp.asarray(valid),
        "q": jnp.asarray(q), "w": jnp.asarray(kw_w),
        "bias": jnp.asarray(kw_bias),
    }

    blk = pallas_scorer._pick_block_coarse(n)
    from omni_recall_tpu.search.engine import _coarse_layout

    sub_c, t_c = _coarse_layout(n, m, blk)
    now = jnp.float32(365.0)
    g, steps = 4, 2

    # every megastep takes `dv` (the device arrays) as an ARGUMENT — closing
    # over them would bake multi-GB XLA constants into the executable
    # (CLAUDE.md: minutes-long remote compiles on the tunnel)
    def scan_only(dv, qv):
        return pallas_scorer.score_topm_int8_coarse(
            dv["e1"], dv["s1"], dv["err1"], dv["created"], dv["valid"],
            qv, dv["w"], dv["bias"], now, jnp.int32(0), m=m, t=t_c, sub=sub_c,
            interpret=False,
        )

    @jax.jit
    def mega_scan(carry, q_all, dv):
        def body(c, qv):
            qv = qv + 1e-12 * c[:, None]
            vals, idxs = scan_only(dv, qv)
            return vals[:, 0] + idxs[:, 0].astype(jnp.float32) * 1e-9, None

        c, _ = jax.lax.scan(body, carry, q_all)
        return c

    @jax.jit
    def mega_full(carry, q_all, dv):
        def body(c, qv):
            qv = qv + 1e-12 * c[:, None]
            vals, idxs = scan_only(dv, qv)
            rows, ubs, bound = refine_mod.refine_select_from_scan(
                dv["e1"], dv["s1"], dv["e2"], dv["s2"], dv["err2"],
                dv["bloom"], dv["created"], dv["valid"],
                qv, dv["w"], dv["bias"], now, vals, idxs,
            )
            return ubs[:, 0] + rows[:, 0].astype(jnp.float32) * 1e-9 + bound, None

        c, _ = jax.lax.scan(body, carry, q_all)
        return c

    # gather only: take the candidate rows of both planes + bloom
    cand = jnp.asarray(
        rng.integers(0, n, size=(b, m)).astype(np.int32)
    )

    @jax.jit
    def mega_gather(carry, q_all, cand, dv):
        def body(c, qv):
            rows = (cand + c[:, None].astype(jnp.int32)) % n
            c1 = jnp.take(dv["e1"], rows, axis=0)
            c2 = jnp.take(dv["e2"], rows, axis=0)
            bl = jnp.take(dv["bloom"], rows, axis=0)
            out = (
                c1[:, 0, 0].astype(jnp.float32)
                + c2[:, 0, 0].astype(jnp.float32)
                + bl[:, 0, 0].astype(jnp.float32)
            )
            return out, None

        c, _ = jax.lax.scan(body, carry, q_all)
        return c

    # refine_ub on static candidate rows (gather + dots + bloom dot)
    @jax.jit
    def mega_refine(carry, q_all, cand, dv):
        def body(c, qv):
            qv = qv + 1e-12 * c[:, None]
            vals = jnp.zeros((b, m), dtype=jnp.float32)
            from omni_recall_tpu.ops.pallas_scorer import quantize_kw_weights

            kw8 = quantize_kw_weights(dv["w"])
            ref = refine_mod.refine_ub(
                dv["e1"], dv["s1"], dv["e2"], dv["s2"], dv["err2"],
                dv["bloom"], dv["created"], dv["valid"],
                qv, kw8, dv["bias"], now, cand, vals,
            )
            return ref[:, 0], None

        c, _ = jax.lax.scan(body, carry, q_all)
        return c

    # select only: top_k_with_payload over [B, m]
    vals0 = jnp.asarray(rng.standard_normal((b, m)).astype(np.float32))

    @jax.jit
    def mega_select(carry, q_all, cand, vals0):
        def body(c, qv):
            v = vals0 + c[:, None]
            tv, ti = top_k_with_payload(v, cand, 33)
            return tv[:, 0] + ti[:, 0].astype(jnp.float32) * 1e-9, None

        c, _ = jax.lax.scan(body, carry, q_all)
        return c

    q_all = jnp.asarray(
        rng.standard_normal((g, b, d)).astype(np.float32)
    )
    carry = jnp.zeros((b,), dtype=jnp.float32)

    timeit(mega_gather, carry, (q_all, cand, dev), g, steps, "gather only (c1+c2+bloom)")
    timeit(mega_select, carry, (q_all, cand, vals0), g, steps, "select only (top_k m->33)")
    timeit(mega_refine, carry, (q_all, cand, dev), g, steps, "refine_ub (gather+dots)")
    timeit(mega_scan, carry, (q_all, dev), g, steps, "coarse scan only")
    timeit(mega_full, carry, (q_all, dev), g, steps, "scan + refine_select (serve)")


if __name__ == "__main__":
    main()
