"""Probe: how much of the ~1.2 s/call 1-device sharded scan is device
compute vs per-call tunnel dispatch?

The bench times the UNSHARDED scan with chained lax.scan megasteps (pure
device time, one readback), but timed the sharded path with a per-call
python loop — through a tunnel whose per-dispatch cost is large, that is
not the same measurement. This probe times:

  RTT  — a tiny jit dispatch + readback (the tunnel floor)
  A    — per-call loop over the ShardedScorer coarse executable (readback
         forced; block_until_ready lies on this tunnel)
  M    — the same shard_map body chained G times inside ONE jitted
         lax.scan megastep (device time per scan)

Run on the real chip: PYTHONPATH=. python -u tools/probe_sharded_timing.py
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from omni_recall_tpu.parallel.sharded import ShardedScorer


def main() -> None:
    n, d, bits, b = 1 << 20, 768, 1024, 448
    w = bits // 8

    key = jax.random.PRNGKey(0)
    emb_f = jax.random.normal(key, (n, d), dtype=jnp.float32)
    emb_f = emb_f / jnp.linalg.norm(emb_f, axis=1, keepdims=True)
    absmax = jnp.max(jnp.abs(emb_f), axis=1, keepdims=True)
    scale = (absmax / 127.0)[:, 0]
    emb = jnp.clip(jnp.round(emb_f / (absmax / 127.0)), -127, 127).astype(jnp.int8)
    err = jnp.linalg.norm(
        emb_f - emb.astype(jnp.float32) * scale[:, None], axis=1
    ) * 1.000001
    del emb_f
    bloom = jax.random.bits(key, (n, w), dtype=jnp.uint8)
    created = jnp.linspace(0.0, 365.0, n, dtype=jnp.float32)
    valid = jnp.ones((n,), dtype=bool)

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, d)).astype(np.float32))
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    kw = jnp.asarray(
        (rng.uniform(size=(b, bits)) < 0.04).astype(np.float32) * 0.025
    )
    bias = jnp.zeros((b,), dtype=jnp.float32)
    now1, r01 = jnp.float32(365.0), jnp.int32(0)

    # tunnel dispatch floor: tiny jit call + tiny readback
    tiny = jax.jit(lambda x: (x * 2.0).sum())
    xsmall = jnp.ones((8, 8), jnp.float32)
    _ = float(tiny(xsmall))
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        _ = float(tiny(xsmall))
    rtt = (time.perf_counter() - t0) / reps * 1000.0
    print(f"RTT: tiny jit dispatch + readback        {rtt:9.3f} ms/call")

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("shards",))
    ss = ShardedScorer(mesh, interpret=False)

    def call(qq):
        return ss.score_topm(
            emb, bloom, created, valid, qq, kw, bias, now1, r01,
            m=128, mode="pallas_int8_coarse", t=1, sub=1024,
            scale=scale, err=err,
        )

    # A: per-call loop, completion forced by readback each call
    v, i = call(q)
    _ = np.asarray(v[:2, :2])
    reps = 4
    t0 = time.perf_counter()
    for _ in range(reps):
        v, i = call(q)
        _ = np.asarray(v[:2, :2])  # force completion through the tunnel
    per_a = (time.perf_counter() - t0) / reps * 1000.0
    print(f"A: per-call loop w/ readback             {per_a:9.3f} ms/call")

    # M: chained megastep — G sharded scans inside ONE jit, one readback
    local_fn = ss._fns[("pallas_int8_coarse", 128, 1, 1024)]
    G = 8

    def mega(emb_, scale_, err_, bloom_, created_, valid_, q0, kw_, bias_):
        def step(c, _):
            vv, ii = local_fn(
                emb_, scale_, err_, bloom_, created_, valid_,
                c, kw_, bias_, now1, r01,
            )
            c2 = q0 + 1e-12 * vv[:, :1]
            return c2, vv[0, 0]
        c, outs = jax.lax.scan(step, q0, xs=None, length=G)
        return outs

    mega_j = jax.jit(mega)
    outs = mega_j(emb, scale, err, bloom, created, valid, q, kw, bias)
    _ = np.asarray(outs)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        outs = mega_j(emb, scale, err, bloom, created, valid, q, kw, bias)
        _ = np.asarray(outs)
    per_m = (time.perf_counter() - t0) / reps / G * 1000.0
    print(f"M: megastep (device time per scan)       {per_m:9.3f} ms/scan")


if __name__ == "__main__":
    main()
