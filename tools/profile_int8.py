"""Profile the real int8 kernel across configs on TPU (shared data gen)."""
import time, functools, jax, jax.numpy as jnp, numpy as np
from omni_recall_tpu.ops import pallas_scorer

n, d = 1 << 20, 768
k = jax.random.PRNGKey(0)
emb_f = jax.random.normal(k, (n, d), jnp.float32)
emb_f = emb_f / jnp.linalg.norm(emb_f, axis=1, keepdims=True)
absmax = jnp.max(jnp.abs(emb_f), axis=1, keepdims=True)
row_scale = (absmax / 127.0)[:, 0]
emb8 = jnp.clip(jnp.round(emb_f / (absmax / 127.0)), -127, 127).astype(jnp.int8)
del emb_f
created = jnp.linspace(0., 365., n); valid = jnp.ones((n,), bool)
add_row = pallas_scorer.make_add_row(created, valid, jnp.float32(365.), jnp.int32(0))

def run(b, bits, t_block, sub, iters=6, label=""):
    w8 = bits // 8
    bloom = jax.random.bits(k, (n, w8), dtype=jnp.uint8)
    q = jax.random.normal(k, (b, d), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    q_scale = jnp.max(jnp.abs(q), axis=1, keepdims=True) / 127.0
    q8 = jnp.clip(jnp.round(q / q_scale), -127, 127).astype(jnp.int8)
    kw_w8 = jnp.zeros((b, bits), jnp.int8)
    kw_b = jnp.zeros((b, 1), jnp.float32)
    q_bias = jnp.zeros((b, 1), jnp.float32)

    @jax.jit
    def step(c, q8, emb8a, blooma, add_rowa, row_scalea):
        q8x = (q8.astype(jnp.int32) + (c[:, None] * 0).astype(jnp.int32)).astype(jnp.int8)
        vals, idxs = pallas_scorer.block_topt_int8(
            emb8a, blooma, q8x, kw_w8, kw_b, add_rowa,
            row_scalea[None, :], q_scale, q_bias, t=t_block, sub=sub)
        return vals[:, 0, 0] + c * 1e-9
    c = step(jnp.zeros(b), q8, emb8, bloom, add_row, row_scale); _ = np.asarray(c[:1])
    t0 = time.perf_counter()
    for i in range(iters):
        c = step(c, q8, emb8, bloom, add_row, row_scale)
    _ = np.asarray(c[:1])
    dt = (time.perf_counter() - t0) / iters
    print(f"{label} B={b} bits={bits} t={t_block} sub={sub}: {dt*1000:.2f} ms -> {b/dt:.0f} qps", flush=True)

run(128, 1024, 1, 512, label="base")
run(128, 512, 1, 512, label="bits512")
run(256, 512, 1, 512, label="bits512")
run(512, 512, 1, 512, label="bits512")
run(256, 1024, 1, 512, label="base")
