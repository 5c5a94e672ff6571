"""Sweep the coarse-scan extraction layout (sub, t) on the serving path.

The serving scan's extraction depth is the dominant cost above the t=1
headline scan (~4.7 ms per extra round at 1M x 1536 — each round is a full
VPU pass over the score tiles), while collision safety only needs > t of a
query's top-scoring rows to land in one sub-slice before the certificate
fails (an escalation, never an exactness loss). This sweep measures BOTH
sides on the real bench corpus:

  stage 1  kernel-only: coarse scan + merge ms per (sub, t) layout
  stage 2  engine: pipelined certified e2e at each layout — coarse
           resolution, escalation rounds, wall time

Run on the real chip:
  PYTHONPATH=.:/root/.axon_site python -u tools/sweep_serving_layout.py
Knobs: SWEEP_N (default 1M), SWEEP_BT (1536), SWEEP_G (3 batches/config),
SWEEP_CONFIGS ("1024,4;512,3;512,2;256,2;1024,3;1024,2"),
SWEEP_STAGE1=0 to skip the kernel-only stage (each config is a fresh
remote compile; the engine stage is usually the question).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    n = int(os.environ.get("SWEEP_N", 1 << 20))
    bt = int(os.environ.get("SWEEP_BT", 1536))
    g = int(os.environ.get("SWEEP_G", 3))
    d, bits, m = 768, 1024, 128
    configs = [
        tuple(int(x) for x in c.split(","))
        for c in os.environ.get(
            "SWEEP_CONFIGS", "1024,4;512,3;512,2;256,2;1024,3;1024,2"
        ).split(";")
    ]

    import jax
    import jax.numpy as jnp

    import bench
    from omni_recall_tpu.ops import pallas_scorer
    from omni_recall_tpu.ops.merge import top_k_with_payload
    from omni_recall_tpu.ops.quantize import quantize_rows_int8

    if os.environ.get("SWEEP_STAGE1", "1") != "1":
        configs_s1 = []
    else:
        configs_s1 = configs
    # ---- stage 1: kernel-only scan+merge timing per layout ----
    print(f"== stage 1: kernel scan+merge at n={n}, bt={bt}, m={m}")
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    emb_h = np.empty((n, d), dtype=np.int8)
    scale_h = np.empty((n,), dtype=np.float32)
    err_h = np.empty((n,), dtype=np.float32)
    slab = 1 << 17
    for s0 in range(0, n, slab):
        f = rng.standard_normal((min(slab, n - s0), d), dtype=np.float32)
        f /= np.linalg.norm(f, axis=1, keepdims=True)
        q8, sc, er = quantize_rows_int8(f)
        emb_h[s0: s0 + f.shape[0]] = q8
        scale_h[s0: s0 + f.shape[0]] = sc
        err_h[s0: s0 + f.shape[0]] = er
    emb = jnp.asarray(emb_h)
    r_scale = jnp.asarray(scale_h)[None, :]
    del emb_h, scale_h, err_h
    created = jnp.linspace(0.0, 365.0, n, dtype=jnp.float32)
    valid = jnp.ones((n,), dtype=bool)
    add_row = pallas_scorer.make_add_row(
        created, valid, jnp.float32(365.0), jnp.int32(0)
    )
    qf = rng.standard_normal((bt, d)).astype(np.float32)
    qf /= np.linalg.norm(qf, axis=1, keepdims=True)
    q = jnp.asarray(qf)
    scale = jnp.asarray(r_scale[0])
    err = jnp.zeros((n,), dtype=jnp.float32)
    w = jnp.asarray(
        (rng.uniform(size=(bt, bits)) < (40.0 / bits)).astype(np.float32)
        * 0.025
    )
    bias = jnp.zeros((bt,), dtype=jnp.float32)

    def mega(sub, t):
        # the engine's exact serving entry point (score_topm_int8_coarse):
        # block-gridded scan + candidate merge to top-(m+1)
        @jax.jit
        def run(carry, emb, scale, err, created, valid, q, w):
            def step(c, _):
                # serialize on the previous batch's output (bench.py
                # protocol): a nonzero f32 dependency XLA cannot fold away
                qq = q + 1e-12 * c
                vals, idxs = pallas_scorer.score_topm_int8_coarse(
                    emb, scale, err, created, valid,
                    qq, w, bias, jnp.float32(365.0), jnp.int32(0),
                    m=m, t=t, sub=sub,
                )
                return vals[:, :1], None

            carry, _ = jax.lax.scan(step, carry, xs=None, length=4)
            return carry

        c0 = jnp.zeros((bt, 1), dtype=jnp.float32)
        c = run(c0, emb, scale, err, created, valid, q, w)
        _ = np.asarray(c[:8])
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            c = run(c, emb, scale, err, created, valid, q, w)
        _ = np.asarray(c[:8])
        return (time.perf_counter() - t0) / (4 * reps) * 1000.0

    kernel_ms = {}
    for sub, t in configs_s1:
        try:
            ms = mega(sub, t)
        except Exception as e:  # layout unsupported (e.g. m > slices*t)
            msg = str(e).splitlines()[0][:160]
            print(f"  sub={sub:5d} t={t}  FAILED: {type(e).__name__}: {msg}")
            continue
        kernel_ms[(sub, t)] = ms
        print(f"  sub={sub:5d} t={t}  scan+merge {ms:8.3f} ms/batch", flush=True)
    del emb, r_scale, created, valid, add_row, q, w, scale, err

    # ---- stage 2: certified engine resolution per layout ----
    print(f"== stage 2: engine pipelined e2e on the bench corpus (n={n})")
    engine, make_requests, now, opts = bench.build_e2e_engine(n, d, bits)
    for sub, t in configs:
        engine.options.coarse_sub = sub
        engine.options.coarse_t = t
        engine._coarse_outcomes = []
        engine._coarse_skip_until = 0
        engine.search_batches_pipelined([make_requests(50, bt)], now=now)
        s0 = {k: v for k, v in engine.stats.items()}
        t0 = time.perf_counter()
        outs = engine.search_batches_pipelined(
            [make_requests(300 + i, bt) for i in range(g)], now=now
        )
        el = time.perf_counter() - t0
        nq = g * bt
        assert sum(len(h) for out in outs for h in out) == nq * 10
        res = (engine.stats["coarse_resolved_total"] - s0["coarse_resolved_total"]) / nq
        esc = engine.stats["escalation_rounds_total"] - s0["escalation_rounds_total"]
        dd = (engine.stats["dd_resolved_total"] - s0["dd_resolved_total"]) / nq
        hf = engine.stats["host_fallbacks_total"] - s0["host_fallbacks_total"]
        print(
            f"  sub={sub:5d} t={t}  {nq/el:8.1f} qps  {el/g*1000:8.1f} ms/batch"
            f"  coarse={res:.4f} dd={dd:.4f} esc_rounds={esc} host_fb={hf}",
            flush=True,
        )


if __name__ == "__main__":
    main()
