"""A/B: transposed bloom [W, N] + sublane-concat decode vs row layout."""
import time, jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

n, d = 1 << 20, 768
k = jax.random.PRNGKey(0)
emb8 = jax.random.randint(k, (n, d), -127, 127, dtype=jnp.int8)

def variant(b, bits, transposed, c=2048, iters=8):
    w = bits // 8
    q8 = jax.random.randint(k, (b, d), -127, 127, dtype=jnp.int8)
    kw8 = jax.random.randint(k, (b, bits), 0, 2, dtype=jnp.int8)
    add = jnp.zeros((1, n), jnp.float32)
    if transposed:
        bloom = jax.random.bits(k, (w, n), dtype=jnp.uint8)
        bspec = pl.BlockSpec((w, c), lambda i: (0, i), memory_space=pltpu.VMEM)
    else:
        bloom = jax.random.bits(k, (n, w), dtype=jnp.uint8)
        bspec = pl.BlockSpec((c, w), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def kernel(emb_ref, bloom_ref, q_ref, kw_ref, add_ref, out_ref):
        cos = jax.lax.dot_general(q_ref[:], emb_ref[:], (((1,),(1,)),((),())),
                                  preferred_element_type=jnp.int32).astype(jnp.float32)
        words = bloom_ref[:].astype(jnp.int32)
        if transposed:
            bits_t = jnp.concatenate([((words >> s) & 1) for s in range(8)], axis=0).astype(jnp.int8)  # [bits, C]
            kw = jax.lax.dot_general(kw_ref[:], bits_t, (((1,),(0,)),((),())),
                                     preferred_element_type=jnp.int32).astype(jnp.float32)
        else:
            bits_ = jnp.concatenate([((words >> s) & 1) for s in range(8)], axis=1).astype(jnp.int8)  # [C, bits]
            kw = jax.lax.dot_general(kw_ref[:], bits_, (((1,),(1,)),((),())),
                                     preferred_element_type=jnp.int32).astype(jnp.float32)
        s = 0.7*cos*1e-4 + 0.2*kw*(1/127.) + add_ref[:]
        # cheap top-1 per 512 slice to keep outputs small
        for j in range(c // 512):
            out_ref[0, :, j:j+1] = jnp.max(s[:, j*512:(j+1)*512], axis=1, keepdims=True)

    kern = pl.pallas_call(kernel, grid=(n // c,),
        in_specs=[pl.BlockSpec((c, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
                  bspec,
                  pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((b, bits), lambda i: (0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, c), lambda i: (0, i), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, b, c // 512), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n // c, b, c // 512), jnp.float32))

    @jax.jit
    def step(carry, emb8, bloom, q8):
        q8x = (q8.astype(jnp.int32) + (carry[:, None]*0).astype(jnp.int32)).astype(jnp.int8)
        out = kern(emb8, bloom, q8x, kw8, add)
        return carry + out[0, :, 0]*1e-9
    carry = step(jnp.zeros(b), emb8, bloom, q8); _ = np.asarray(carry[:1])
    t0 = time.perf_counter()
    for i in range(iters):
        carry = step(carry, emb8, bloom, q8)
    _ = np.asarray(carry[:1])
    dt = (time.perf_counter()-t0)/iters
    print(f"B={b} bits={bits} T={transposed} c={c}: {dt*1000:.2f} ms -> {b/dt:.0f} qps", flush=True)

variant(512, 512, True)
variant(512, 512, False)
variant(512, 1024, True)
variant(512, 1024, False)
variant(128, 1024, True)
