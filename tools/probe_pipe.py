"""Probe: software-pipelined coarse scan — MXU matmul of block k
overlapping the VPU extraction of block k-1 via a two-slot VMEM scratch.

tools/probe_serve.py showed the serving scan's cost is ADDITIVE:
~12 ms matmul + ~15.5 ms extraction at (1M, 1536, t=4). Inside one kernel
body the extraction depends on the just-computed scores, so Mosaic cannot
overlap the units. This prototype defers extraction by one grid step
(extract block k-1 from scratch while the MXU runs block k) — if Mosaic's
scheduler interleaves the independent instruction streams, the scan drops
toward max(matmul, extraction).

Run: PYTHONPATH=.:/root/.axon_site python -u tools/probe_pipe.py
"""

from __future__ import annotations

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from omni_recall_tpu.ops import pallas_scorer
from omni_recall_tpu.ops.pallas_scorer import (
    PALLAS_CERT_EPS_INT8,
    _extract_topt,
)


def _make_pipe_kernel(t1: int, c: int, sub: int):
    def kernel(emb_ref, q_ref, add_row_ref, scale_row_ref, q_scale_ref,
               q_bias_ref, vals_ref, idxs_ref, s0, s1):
        k = pl.program_id(0)
        cosd = jax.lax.dot_general(
            q_ref[:], emb_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        scores = (
            cosd * q_scale_ref[:] * scale_row_ref[:]
            + add_row_ref[:]
            + q_bias_ref[:]
            + PALLAS_CERT_EPS_INT8
        )

        @pl.when(k % 2 == 0)
        def _():
            s0[:] = scores

        @pl.when(k % 2 == 1)
        def _():
            s1[:] = scores

        @pl.when(k > 0)
        def _():
            base = (k - 1) * c

            @pl.when((k - 1) % 2 == 0)
            def _():
                _extract_topt(s0[:], c, sub, t1, vals_ref, idxs_ref,
                              block_base=base)

            @pl.when((k - 1) % 2 == 1)
            def _():
                _extract_topt(s1[:], c, sub, t1, vals_ref, idxs_ref,
                              block_base=base)

    return kernel


@functools.partial(jax.jit, static_argnames=("t", "sub", "c"))
def pipe_scan(emb8, q8, add_row, scale_row, q_scale, q_bias,
              t: int, sub: int, c: int):
    n, d = emb8.shape
    b = q8.shape[0]
    t1 = t + 1
    n_sub = c // sub
    nblocks = n // c
    last = nblocks - 1

    vals, idxs = pl.pallas_call(
        _make_pipe_kernel(t1, c, sub),
        grid=(nblocks + 1,),
        in_specs=[
            pl.BlockSpec((c, d), lambda i: (jnp.minimum(i, last), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, jnp.minimum(i, last)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, jnp.minimum(i, last)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, b, n_sub * t1),
                         lambda i: (jnp.maximum(i - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, n_sub * t1),
                         lambda i: (jnp.maximum(i - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nblocks, b, n_sub * t1), jnp.float32),
            jax.ShapeDtypeStruct((nblocks, b, n_sub * t1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((b, c), jnp.float32),
            pltpu.VMEM((b, c), jnp.float32),
        ],
        # two [B, C] score slots + the extraction working set exceed the
        # 16 MB default scoped-vmem budget; v5e has 128 MB of VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * b * d,
            bytes_accessed=n * d + b * nblocks * n_sub * t1 * 8,
            transcendentals=0,
        ),
    )(emb8, q8, add_row, scale_row, q_scale, q_bias)
    return vals, idxs


def mega(body, carry0, args, g, reps, label):
    @jax.jit
    def run(carry, *a):
        def step(cr, _):
            return body(cr, *a), None

        carry, _ = jax.lax.scan(step, carry, xs=None, length=g)
        return carry

    cr = run(carry0, *args)
    _ = np.asarray(cr[:2])
    t0 = time.perf_counter()
    for _ in range(reps):
        cr = run(cr, *args)
    _ = np.asarray(cr[:2])
    per = (time.perf_counter() - t0) / (g * reps) * 1000.0
    print(f"{label:52s} {per:9.3f} ms/batch", flush=True)
    return per


def main() -> None:
    n, d, bt, t = 1 << 20, 768, 1536, 4
    key = jax.random.PRNGKey(0)
    emb1 = jax.random.randint(key, (n, d), -127, 128, dtype=jnp.int32).astype(jnp.int8)
    scale1 = jnp.full((n,), 1.0 / 127.0 / np.sqrt(d), jnp.float32)
    add_row = jnp.zeros((1, n), jnp.float32)
    rng = np.random.default_rng(0)
    q = rng.standard_normal((bt, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q8, q_scale, _eq = pallas_scorer.quantize_queries_int8(jnp.asarray(q))
    # the production kernel folds the 0.7 cosine weight into q_scale; do
    # the IDENTICAL f32 multiply here so outputs compare bit-for-bit
    q_scale = pallas_scorer.COSINE_WEIGHT * q_scale
    q_bias = jnp.zeros((bt, 1), jnp.float32)

    g, reps = 4, 2

    # carry must perturb an f32 operand: an int8 `q8 + carry*0` is folded
    # by XLA (int x*0=0, x+0=x), leaving the kernel loop-invariant — the
    # scan hoists it and the probe under-reports by g. (This bug produced
    # the bogus 15.7 ms "pipelined win"; honest numbers are ~51 ms
    # pipelined vs ~27.5 baseline at 1M x 1536 x t=4.)
    for c, sub in ((512, 512), (1024, 1024), (1024, 512)):
        def body(cr, e, s, ar, q8v, qs, qb, c=c, sub=sub):
            qs = qs + 1e-12 * cr[:, None]
            vals, idxs = pipe_scan(e, q8v, ar, s[None, :], qs, qb,
                                   t=t, sub=sub, c=c)
            # vals is [nblocks, b, nt]
            return cr * 0 + vals[0, :, 0] + idxs[0, :, 0].astype(jnp.float32) * 1e-9

        mega(body, jnp.zeros((bt,), jnp.float32),
             (emb1, scale1, add_row, q8, q_scale, q_bias),
             g, reps, f"P  pipelined scan c={c} sub={sub} t={t}")

    # correctness: pipelined vs the production kernel's merge inputs
    c, sub = 1024, 1024
    vals_p, idxs_p = pipe_scan(
        emb1, q8, add_row, scale1[None, :], q_scale, q_bias, t=t, sub=sub, c=c
    )
    # block_topt_int8_coarse folds 0.7 itself: hand it the UNfolded scale
    # via the same jnp value (recompute to keep bit-compare valid)
    _, q_scale_raw, _ = pallas_scorer.quantize_queries_int8(jnp.asarray(q))
    vals_r, idxs_r = pallas_scorer.block_topt_int8_coarse(
        emb1, q8, add_row, scale1[None, :], q_scale_raw,
        q_bias, t=t, sub=sub,
    )
    vp = np.transpose(np.asarray(vals_p), (1, 0, 2)).reshape(bt, -1)
    vr = np.asarray(vals_r).reshape(bt, -1)
    ip = np.transpose(np.asarray(idxs_p), (1, 0, 2)).reshape(bt, -1)
    ir = np.asarray(idxs_r).reshape(bt, -1)
    print("vals equal:", bool((vp == vr).all()), "idxs equal:",
          bool((ip == ir).all()))


if __name__ == "__main__":
    main()
