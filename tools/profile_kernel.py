"""Kernel variant profiler (run on TPU): isolates cos matmul / kw matmul /
top-T extraction costs at 1M rows. NOTE: keep large arrays as jit ARGS, not
closures — captured arrays become XLA constants and explode compile time."""
import time, functools, sys, jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

n, d, b, bits = 1 << 20, 768, 128, 1024
w = bits // 8
k = jax.random.PRNGKey(0)
emb = jax.random.normal(k, (n, d), jnp.bfloat16)
bloom = jax.random.bits(k, (n, w), dtype=jnp.uint8)
q = jax.random.normal(k, (b, d), jnp.float32)
kw_w = jnp.zeros((b, bits), jnp.float32)
kw_b = jnp.zeros((b, 1), jnp.float32)
add_row = jnp.zeros((1, n), jnp.float32)

def bench_variant(name, kernel_body, c, t1, outs="topt"):
    grid = (n // c,)
    if outs == "topt":
        out_specs = (pl.BlockSpec((1, b, t1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),)
        out_shape = (jax.ShapeDtypeStruct((n // c, b, t1), jnp.float32),)
    else:
        out_specs = (pl.BlockSpec((1, b, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),)
        out_shape = (jax.ShapeDtypeStruct((n // c, b, 128), jnp.float32),)
    kern = pl.pallas_call(
        kernel_body, grid=grid,
        in_specs=[
            pl.BlockSpec((c, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, bits), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs, out_shape=out_shape,
    )
    @jax.jit
    def step(carry, emb, bloom, q):
        q = q + 1e-12 * carry[:, None]
        (out,) = kern(emb, bloom, q, kw_w, kw_b, add_row)
        s = jnp.sum(out[0, :, 0])
        return carry + 1e-12 * s, out
    carry = jnp.zeros((b,), jnp.float32)
    carry, _ = step(carry, emb, bloom, q); _ = np.asarray(carry[:1])
    t0 = time.perf_counter()
    for i in range(8):
        carry, _ = step(carry, emb, bloom, q)
    _ = np.asarray(carry[:1])
    dt = (time.perf_counter() - t0) / 8
    print(f"{name} (c={c}): {dt*1000:.2f} ms/scan -> {b/dt:.0f} qps", flush=True)

def mk_cos_only(c):
    def kernel(emb_ref, bloom_ref, q_ref, kw_w_ref, kw_b_ref, add_ref, out_ref):
        cos = jax.lax.dot_general(q_ref[:].astype(jnp.bfloat16), emb_ref[:].astype(jnp.bfloat16),
              (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        out_ref[0, :, :] = cos[:, :128]  # touch result
    return kernel

def mk_cos_kw(c):
    def kernel(emb_ref, bloom_ref, q_ref, kw_w_ref, kw_b_ref, add_ref, out_ref):
        cos = jax.lax.dot_general(q_ref[:].astype(jnp.bfloat16), emb_ref[:].astype(jnp.bfloat16),
              (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        words = bloom_ref[:].astype(jnp.int32)
        bits_ = jnp.concatenate([((words >> s) & 1) for s in range(8)], axis=1).astype(jnp.bfloat16)
        kw = jax.lax.dot_general(kw_w_ref[:].astype(jnp.bfloat16), bits_,
              (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ub = 0.7*cos + 0.2*jnp.minimum(kw + kw_b_ref[:], 1.0) + add_ref[:]
        out_ref[0, :, :] = ub[:, :128]
    return kernel

def mk_full(c, t1):
    def kernel(emb_ref, bloom_ref, q_ref, kw_w_ref, kw_b_ref, add_ref, vals_ref):
        cos = jax.lax.dot_general(q_ref[:].astype(jnp.bfloat16), emb_ref[:].astype(jnp.bfloat16),
              (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        words = bloom_ref[:].astype(jnp.int32)
        bits_ = jnp.concatenate([((words >> s) & 1) for s in range(8)], axis=1).astype(jnp.bfloat16)
        kw = jax.lax.dot_general(kw_w_ref[:].astype(jnp.bfloat16), bits_,
              (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        s = 0.7*cos + 0.2*jnp.minimum(kw + kw_b_ref[:], 1.0) + add_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, (b, c), 1)
        for t in range(t1):
            v = jnp.max(s, axis=1, keepdims=True)
            idx = jnp.min(jnp.where(s == v, lane, c), axis=1, keepdims=True)
            vals_ref[0, :, t:t+1] = v
            s = jnp.where(lane == idx, -1e30, s)
    return kernel

which = sys.argv[1] if len(sys.argv) > 1 else "all"
for c in (1024, 2048, 4096):
    if n % c: continue
    if which in ("all", "cos"): bench_variant("cos-only", mk_cos_only(c), c, 128, outs="wide")
    if which in ("all", "coskw"): bench_variant("cos+kw", mk_cos_kw(c), c, 128, outs="wide")
    if which in ("all", "full"): bench_variant("full t=8", mk_full(c, 9), c, 9, outs="topt")
