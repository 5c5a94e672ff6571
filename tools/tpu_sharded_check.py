"""Sharded-path check on real TPU silicon (VERDICT r2 weak #3).

Runs the shard_map int8 kernels (full fused, coarse, keyword-only) on a
1-device 'shards' mesh with interpret=False and asserts bit-parity with
the unsharded kernels. Mosaic-under-shard_map (layouts, collective
scheduling) is exactly the kind of thing that breaks only on hardware;
every CI run uses a virtual CPU mesh in interpret mode instead.

Exit code 0 = parity holds. Also exercised (at 1M rows, with timing) by
bench.py's sharded stage; this standalone keeps the check runnable from
tests/test_sharded.py via subprocess on a TPU host (OMNI_TPU_TESTS=1).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

assert jax.default_backend() == "tpu", (
    f"needs a real TPU backend, got {jax.default_backend()}"
)

from jax.sharding import Mesh

from omni_recall_tpu.ops import pallas_scorer
from omni_recall_tpu.parallel.sharded import ShardedScorer

n, d, bits, b, m = 1 << 16, 256, 512, 64, 128
w = bits // 8
key = jax.random.PRNGKey(0)
emb_f = jax.random.normal(key, (n, d), dtype=jnp.float32)
emb_f = emb_f / jnp.linalg.norm(emb_f, axis=1, keepdims=True)
absmax = jnp.max(jnp.abs(emb_f), axis=1, keepdims=True)
scale = (absmax / 127.0)[:, 0]
emb8 = jnp.clip(jnp.round(emb_f / (absmax / 127.0)), -127, 127).astype(jnp.int8)
err = jnp.linalg.norm(emb_f - emb8.astype(jnp.float32) * scale[:, None], axis=1) * 1.0001
bloom = jax.random.bits(key, (n, w), dtype=jnp.uint8) & jax.random.bits(
    jax.random.fold_in(key, 1), (n, w), dtype=jnp.uint8
)
created = jnp.linspace(0.0, 365.0, n, dtype=jnp.float32)
valid = jnp.ones((n,), dtype=bool)
q = jax.random.normal(jax.random.PRNGKey(1), (b, d), dtype=jnp.float32)
q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
kw_w = jnp.where(
    jax.random.uniform(jax.random.PRNGKey(2), (b, bits)) < 0.05, 0.02, 0.0
).astype(jnp.float32)
kw_b = jnp.zeros((b,), dtype=jnp.float32)
now, r0 = jnp.float32(365.0), jnp.int32(0)

mesh = Mesh(np.asarray(jax.devices()[:1]), ("shards",))
ss = ShardedScorer(mesh, interpret=False)

checks = []
# full fused int8
rv, ri = pallas_scorer.score_topm_int8(
    emb8, scale, err, bloom, created, valid, q, kw_w, kw_b, now, r0,
    m=m, t=8, sub=512,
)
sv, si = ss.score_topm(
    emb8, bloom, created, valid, q, kw_w, kw_b, now, r0,
    m=m, mode="pallas_int8", t=8, sub=512, scale=scale, err=err,
)
checks.append(("pallas_int8", np.asarray(rv), np.asarray(ri), np.asarray(sv), np.asarray(si)))

# coarse
rv, ri = pallas_scorer.score_topm_int8_coarse(
    emb8, scale, err, created, valid, q, kw_w, kw_b, now, r0, m=m, t=8, sub=512,
)
sv, si = ss.score_topm(
    emb8, bloom, created, valid, q, kw_w, kw_b, now, r0,
    m=m, mode="pallas_int8_coarse", t=8, sub=512, scale=scale, err=err,
)
checks.append(("pallas_int8_coarse", np.asarray(rv), np.asarray(ri), np.asarray(sv), np.asarray(si)))

# keyword-only
rv, ri = pallas_scorer.score_topm_kw_only(
    bloom, created, valid, kw_w, kw_b, now, r0, m=m, t=8, sub=512,
)
sv, si = ss.score_topm(
    emb8, bloom, created, valid, None, kw_w, kw_b, now, r0,
    m=m, mode="pallas_kw_only", t=8, sub=512, scale=scale, err=err,
)
checks.append(("pallas_kw_only", np.asarray(rv), np.asarray(ri), np.asarray(sv), np.asarray(si)))

ok = True
for name, rv, ri, sv, si in checks:
    same_i = np.array_equal(ri[:, :m], si[:, :m])
    same_v = np.array_equal(rv, sv)
    print(f"{name}: rows_equal={same_i} vals_equal={same_v}")
    ok = ok and same_i and same_v

# sharded compact serving stage (refine + select + device-exact cosine,
# parallel/sharded.py refine_select_dd) vs the single-device ops — the
# fused Pallas refine kernel under shard_map is Mosaic-on-hardware risk
from omni_recall_tpu.index.device_index import DeviceArrays
from omni_recall_tpu.ops import exact_cos, refine
from omni_recall_tpu.ops.quantize import quantize_rows_int8_residual

q1p, s1p, e1p, q2p, s2p, e2p = quantize_rows_int8_residual(np.asarray(emb_f))
dev = DeviceArrays(
    emb=jnp.asarray(q1p), bloom=bloom, created=created, valid=valid,
    scale=jnp.asarray(s1p), err=jnp.asarray(e1p),
    emb2=jnp.asarray(q2p), scale2=jnp.asarray(s2p), err2=jnp.asarray(e2p),
    raw=emb_f,
)
fv, fi = checks[0][1], checks[0][2]  # the full fused scan's [B, m+1]
q_raw = q * jnp.float32(1.7)
t_out, r = 32, 64
r1, u1, b1 = map(np.asarray, refine.refine_select_from_scan(
    dev.emb, dev.scale, dev.emb2, dev.scale2, dev.err2,
    dev.bloom, dev.created, dev.valid,
    q, kw_w, kw_b, now, jnp.asarray(fv), jnp.asarray(fi),
    t_out=t_out, r=r,
))
rs, us, bs, hi_s, lo_s, sabs_s = map(np.asarray, ss.refine_select_dd(
    dev, q, kw_w, kw_b, now, jnp.asarray(fv), jnp.asarray(fi),
    t_out=t_out, r=r, q_raw=q_raw,
))
hi_1, lo_1, sabs_1 = map(
    np.asarray, exact_cos.exact_cos_rows(dev.raw, jnp.asarray(rs), q_raw)
)
live = (rs >= 0) & (us > -np.inf)
sel_ok = (
    np.array_equal(r1, rs) and np.array_equal(u1, us)
    and np.array_equal(b1, bs)
)
dd_ok = (
    np.array_equal(hi_s[live], hi_1[live])
    and np.array_equal(lo_s[live], lo_1[live])
    and np.array_equal(sabs_s[live], sabs_1[live])
)
print(f"refine_select_dd: select_equal={sel_ok} dd_equal={dd_ok}")
ok = ok and sel_ok and dd_ok

print("PARITY" if ok else "DIVERGED")
sys.exit(0 if ok else 1)
