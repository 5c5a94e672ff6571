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
print("PARITY" if ok else "DIVERGED")
sys.exit(0 if ok else 1)
