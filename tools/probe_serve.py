"""Probe: per-batch device time of each serving-stage component.

BENCH_r03-in-progress measured serve_device_ms_per_batch ~= 43 ms at
(n=1M, d=768, bits=1024, bt=1536, m=128) while the parts claim
scan ~12 ms + gather ~1.5-9 ms + fused refine ~7 ms. This probe times the
components in isolation (chained lax.scan megasteps, one tiny readback,
ALL device arrays passed as arguments — closing over them bakes XLA
constants and stalls the remote compiler for minutes) so the
width-reduction work targets the real hotspot:

  S   coarse int8 scan -> top-(m+1)
  SR  scan + refine_select_from_scan      (the serving megastep)
  G   candidate gather alone              (emb1+emb2+bloom+sidecar takes)
  K   fused refine kernel alone           (pre-gathered slabs)
  T   top_k_with_payload select alone
  Q   quantize_queries_int8_residual alone

Run on the real chip:
  PYTHONPATH=.:/root/.axon_site python -u tools/probe_serve.py
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

from omni_recall_tpu.ops import pallas_scorer, refine
from omni_recall_tpu.ops.merge import top_k_with_payload


def mega(body, carry0, args, g, reps, label):
    """Chain body g times in one jitted lax.scan; time reps calls. Every
    device array must arrive via args — never a closure."""

    @jax.jit
    def run(carry, *a):
        def step(c, _):
            return body(c, *a), None

        carry, _ = jax.lax.scan(step, carry, xs=None, length=g)
        return carry

    c = run(carry0, *args)
    _ = np.asarray(c[:2])  # force
    t0 = time.perf_counter()
    for _ in range(reps):
        c = run(c, *args)
    _ = np.asarray(c[:2])
    per = (time.perf_counter() - t0) / (g * reps) * 1000.0
    print(f"{label:46s} {per:9.3f} ms/batch", flush=True)
    return per


def main() -> None:
    n, d, bits, bt, m = 1 << 20, 768, 1024, 1536, 128
    w = bits // 8
    key = jax.random.PRNGKey(0)

    k1, k2, k3, k4 = jax.random.split(key, 4)
    emb1 = jax.random.randint(k1, (n, d), -127, 128, dtype=jnp.int32).astype(jnp.int8)
    emb2 = jax.random.randint(k2, (n, d), -127, 128, dtype=jnp.int32).astype(jnp.int8)
    scale1 = jnp.full((n,), 1.0 / 127.0 / np.sqrt(d), jnp.float32)
    scale2 = scale1 * 8e-3
    err1 = jnp.full((n,), 8e-3, jnp.float32)
    err2 = jnp.full((n,), 6e-5, jnp.float32)
    bloom = jax.random.bits(k3, (n, w), dtype=jnp.uint8)
    created = jnp.linspace(0.0, 365.0, n, dtype=jnp.float32)
    valid = jnp.ones((n,), dtype=bool)

    rng = np.random.default_rng(0)
    q = rng.standard_normal((bt, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q = jnp.asarray(q)
    kw = jnp.asarray((rng.uniform(size=(bt, bits)) < 0.04).astype(np.float32) * 0.025)
    bias = jnp.zeros((bt,), jnp.float32)
    now1 = jnp.float32(365.0)

    blk = pallas_scorer._pick_block_coarse(n)
    from omni_recall_tpu.search.engine import _coarse_layout

    sub_c, t_c = _coarse_layout(n, m, blk)
    print(f"layout: block={blk} sub={sub_c} t={t_c}", flush=True)

    g, reps = 4, 2

    # S: scan alone
    def scan_body(c, e1, s1, er1, cr, va, qv, kwv, bv):
        qv = qv + 1e-12 * c[:, None]
        vals, idxs = pallas_scorer.score_topm_int8_coarse(
            e1, s1, er1, cr, va, qv, kwv, bv,
            now1, jnp.int32(0), m=m, t=t_c, sub=sub_c,
        )
        return qv[:, 0] * 0 + vals[:, 0] + idxs[:, 0].astype(jnp.float32) * 1e-9

    t_scan = mega(scan_body, jnp.zeros((bt,), jnp.float32),
                  (emb1, scale1, err1, created, valid, q, kw, bias),
                  g, reps, "S  scan")

    # sortedness check (once, outside timing)
    vals, idxs = pallas_scorer.score_topm_int8_coarse(
        emb1, scale1, err1, created, valid, q, kw, bias,
        now1, jnp.int32(0), m=m, t=t_c, sub=sub_c,
    )
    vh = np.asarray(vals)
    mono = bool((np.diff(vh[:, :m], axis=1) <= 1e-12).all())
    print(f"scan candidate bounds sorted desc: {mono}", flush=True)

    # SR: scan + refine_select at the serving width (r=64) + DD stage —
    # the full serving device work
    raw = jax.random.normal(k4, (n, d), dtype=jnp.float32)

    def sr_body(c, e1, s1, er1, e2, s2, er2, bl, cr, va, rw, qv, kwv, bv):
        qv = qv + 1e-12 * c[:, None]
        vals, idxs = pallas_scorer.score_topm_int8_coarse(
            e1, s1, er1, cr, va, qv, kwv, bv,
            now1, jnp.int32(0), m=m, t=t_c, sub=sub_c,
        )
        rows, ubs, bound = refine.refine_select_from_scan(
            e1, s1, e2, s2, er2, bl, cr, va,
            qv, kwv, bv, now1, vals, idxs, r=64,
        )
        out = ubs[:, 0] + rows[:, 0].astype(jnp.float32) * 1e-9 + bound
        if rw is not None:
            from omni_recall_tpu.ops import exact_cos as _ec

            hi, lo, sabs = _ec.exact_cos_rows(rw, rows, qv)
            out = out + hi[:, 0] + lo[:, 0] + sabs[:, 0] * 1e-9
        return out

    t_sr = mega(sr_body, jnp.zeros((bt,), jnp.float32),
                (emb1, scale1, err1, emb2, scale2, err2, bloom, created,
                 valid, raw, q, kw, bias),
                g, reps, "SR scan + refine_select(r=64) + DD")

    t_sr_nodd = mega(sr_body, jnp.zeros((bt,), jnp.float32),
                     (emb1, scale1, err1, emb2, scale2, err2, bloom, created,
                      valid, None, q, kw, bias),
                     g, reps, "SR scan + refine_select(r=64), no DD")

    # DD stage alone (gather + TwoSum tree at t_out=32)
    rows32 = jnp.asarray(rng.integers(0, n, size=(bt, 32)).astype(np.int32))

    def dd_body(c, rw, rf, qv):
        from omni_recall_tpu.ops import exact_cos as _ec

        qv = qv + 1e-12 * c[:, None]
        hi, lo, sabs = _ec.exact_cos_rows(rw, rf, qv)
        return c * 0 + hi[:, 0] + lo[:, 0] + sabs[:, 0] * 1e-9

    t_dd = mega(dd_body, jnp.zeros((bt,), jnp.float32), (raw, rows32, q),
                g, reps, "DD exact_cos_rows(t=32) alone")

    # fixed candidate rows for isolated stages
    rows_fix = jnp.asarray(rng.integers(0, n, size=(bt, m)).astype(np.int32))

    # G: gather alone (emb1+emb2+bloom + stacked sidecar)
    sidecar = jnp.stack(
        [scale1, scale2, err2, created, valid.astype(jnp.float32)], axis=1
    )

    def g_body(c, e1, e2, bl, sc, rf):
        # serialize via an f32-derived index term: int-typed `x + carry*0`
        # is folded by XLA (int *0 -> 0), the gather turns loop-invariant,
        # and the scan hoists it — under-reporting by the chain length g.
        # f32 `carry*0` is NOT folded (NaN/-0), so the cast stays symbolic.
        flat = rf.reshape(-1) + (c[:1] * 0.0).astype(jnp.int32)[0]
        g1 = jnp.take(e1, flat, axis=0)
        g2 = jnp.take(e2, flat, axis=0)
        gb = jnp.take(bl, flat, axis=0)
        gs = jnp.take(sc, flat, axis=0)
        return (
            c * 0
            + g1[:: m, 0].astype(jnp.float32)
            + g2[:: m, 1].astype(jnp.float32)
            + gb[:: m, 0].astype(jnp.float32)
            + gs[:: m, 0]
        )

    t_g = mega(g_body, jnp.zeros((bt,), jnp.float32),
               (emb1, emb2, bloom, sidecar, rows_fix), g, reps,
               "G  gather alone")

    # K: fused kernel alone, pre-gathered slabs
    flat = rows_fix.reshape(-1)
    gc1 = jnp.take(emb1, flat, axis=0)
    gc2 = jnp.take(emb2, flat, axis=0)
    gbloom = jnp.take(bloom, flat, axis=0)
    gsc = jnp.take(sidecar, flat, axis=0).T
    gs1, gs2, gec2 = gsc[0:1], gsc[1:2], gsc[2:3]
    add = jnp.zeros((1, bt * m), jnp.float32)
    kw_w8 = pallas_scorer.quantize_kw_weights(kw)
    q1, t1, q2, t2, eq2 = refine.quantize_queries_int8_residual(q)
    qn = jnp.linalg.norm(q, axis=1, keepdims=True)

    qg = max(1, min(16, 2048 // m))
    ct = qg * m

    def k_body(c, q1v, q2v, t1v, t2v, eq2v, qnv, kwbv, kw8v,
               c1v, c2v, bv, s1v, s2v, e2v, addv):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        # f32 perturbation: an int8 carry injection is constant-folded and
        # the kernel hoists out of the scan (4x under-report)
        s1v = s1v + 1e-12 * c[None, :1]
        out = pl.pallas_call(
            refine._make_refine_kernel_full(qg, ct, m),
            grid=(bt * m // ct,),
            in_specs=[
                pl.BlockSpec((qg, d), lambda k: (k, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((qg, d), lambda k: (k, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((qg, 1), lambda k: (k, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((qg, 1), lambda k: (k, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((qg, 1), lambda k: (k, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((qg, 1), lambda k: (k, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((qg, 1), lambda k: (k, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((qg, bits), lambda k: (k, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((ct, d), lambda k: (k, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((ct, d), lambda k: (k, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((ct, w), lambda k: (k, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ct), lambda k: (0, k), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ct), lambda k: (0, k), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ct), lambda k: (0, k), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ct), lambda k: (0, k), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((qg, ct), lambda k: (k, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bt, ct), jnp.float32),
        )(q1v, q2v, t1v, t2v, eq2v, qnv, kwbv, kw8v, c1v, c2v, bv, s1v, s2v, e2v, addv)
        return c * 0 + out[:, 0]

    t_k = mega(k_body, jnp.zeros((bt,), jnp.float32),
               (q1, q2, t1, t2, eq2, qn, bias[:, None], kw_w8,
                gc1, gc2, gbloom, gs1, gs2, gec2, add),
               g, reps, "K  fused refine kernel alone")

    # T: top_k select alone
    ubs_fix = jnp.asarray(rng.uniform(0.3, 0.9, size=(bt, m)).astype(np.float32))

    def t_body(c, uv, rf):
        uv = uv + 1e-12 * c[:, None]
        tv, ti = top_k_with_payload(uv, rf, 33)
        return c * 0 + tv[:, 0] + ti[:, 0].astype(jnp.float32) * 1e-9

    t_t = mega(t_body, jnp.zeros((bt,), jnp.float32), (ubs_fix, rows_fix),
               g, reps, "T  top_k_with_payload(33) alone")

    # Q: query quantization alone
    def q_body(c, qv):
        qv = qv + 1e-12 * c[:, None]
        q1v, t1v, q2v, t2v, eq2v = refine.quantize_queries_int8_residual(qv)
        return c * 0 + t1v[:, 0] + t2v[:, 0] + eq2v[:, 0] + q1v[:, 0].astype(jnp.float32)

    t_q = mega(q_body, jnp.zeros((bt,), jnp.float32), (q,), g, reps,
               "Q  quantize_queries_int8_residual alone")

    print(f"\nsum of parts S+G+K+T+Q = {t_scan + t_g + t_k + t_t + t_q:.2f} ms; "
          f"SR measured = {t_sr:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
