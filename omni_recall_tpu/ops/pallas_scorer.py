"""Fused Pallas TPU kernel for the hybrid upper-bound scan.

This is the TPU-native replacement for the reference's per-chunk C# scoring
loop (src/OmniRecall.Api/Services/RecallSearchService.cs:28-37): one pass over
the HBM-resident index computes, for a whole query batch,

    ub[b, c] = 0.7 * (q[b] . emb[c])                        (MXU, f32)
             + 0.2 * min(1, bits(bloom[c]) . kw_w[b] + kw_b[b])   (MXU, f32)
             + add_row[c]                                    (recency+mask)
             + CERT_EPS

Kernel-level design notes:
- the bloom signature is decoded IN-KERNEL from packed u8 words to 0/1
  lanes via 8 shift-AND planes concatenated along the lane axis (the packed
  layout in ops/hashing.py was chosen so this is a lane-aligned concat, no
  minor-dim reshape) — the [N, bits] decode never touches HBM,
- the recency term, valid mask and recency-window mask are folded on the
  host side of the launch into one additive per-row term (``add_row``:
  0.1*exp(min(0, created-now)/30) for live rows, -inf otherwise) — an O(N)
  elementwise precompute that XLA fuses, keeping the kernel free of scalar
  control flow,
- queries, keyword weights and the row term use constant index maps, so
  Pallas hoists their fetch out of the grid loop; the chunk-block inputs
  (embeddings + bloom) stream HBM->VMEM with automatic double buffering.

Numerics match ops/xla_scorer.ub_scores (f32 accumulate; parity-tested).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from omni_recall_tpu.ops.oracle import (
    COSINE_WEIGHT,
    KEYWORD_WEIGHT,
    RECENCY_HALF_LIFE_DAYS,
    RECENCY_WEIGHT,
)
from omni_recall_tpu.ops.xla_scorer import _topk_rows

_NEG_INF = -1e30  # finite mask value inside the kernel; mapped to -inf outside

# Certificate margin for the fused kernel. The MXU computes f32 dot products
# via bf16 passes: inputs are rounded to bf16 (half-ulp 2^-9), products are
# exact, accumulation is f32. For L2-normalized operands the dot error is
# bounded by ~2^-8 * sum|q_i c_i| <= 2^-8 (Cauchy-Schwarz), so the cosine
# term diverges from the float64 host oracle by < 0.7 * 0.004; the keyword
# term (weights sum ~<= 1.2, bits exact 0/1) adds < 0.2 * 0.005. 4e-3 covers
# both with slack (observed max divergence ~2.6e-4 at N=8192). A larger eps
# only loosens the upper bound — exactness is preserved, at worst costing a
# candidate-set escalation on pathologically dense score distributions.
PALLAS_CERT_EPS = 4e-3


def _ub_kernel(emb_ref, bloom_ref, q_ref, kw_w_ref, kw_b_ref, add_row_ref, out_ref):
    cos = jax.lax.dot_general(
        q_ref[:], emb_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, C]

    words = bloom_ref[:].astype(jnp.int32)  # [C, W]
    bits = jnp.concatenate(
        [((words >> b) & 1) for b in range(8)], axis=1
    ).astype(jnp.float32)  # [C, W*8], bit j = plane (j div W), word (j mod W)

    kw = jax.lax.dot_general(
        kw_w_ref[:], bits,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, C]
    kw = jnp.minimum(kw + kw_b_ref[:], 1.0)

    out_ref[:] = (
        COSINE_WEIGHT * cos
        + KEYWORD_WEIGHT * kw
        + add_row_ref[:]
        + PALLAS_CERT_EPS
    )


def _pick_block(n: int) -> int:
    for c in (1024, 512, 256, 128):
        if n % c == 0:
            return c
    return 0


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_ub_scores(
    emb: jax.Array,       # f32[N, d]
    bloom: jax.Array,     # u8[N, W]
    q: jax.Array,         # f32[B, d]
    kw_weights: jax.Array,    # f32[B, bits]
    kw_bias: jax.Array,       # f32[B, 1]
    add_row: jax.Array,       # f32[1, N]: 0.1*recency + mask (-1e30 dead rows)
    interpret: bool = False,
) -> jax.Array:
    n, d = emb.shape
    b = q.shape[0]
    w = bloom.shape[1]
    c = _pick_block(n)
    if c == 0:
        raise ValueError(f"row count {n} not divisible by a supported block")

    grid = (n // c,)
    kernel = pl.pallas_call(
        _ub_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((c, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, w * 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, c), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * b * (d + w * 8),
            bytes_accessed=n * d * 4 + n * w + n * b * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )
    return kernel(emb, bloom, q, kw_weights, kw_bias, add_row)


def make_add_row(
    created: jax.Array, valid: jax.Array, now_days, window_start, row_offset=0
) -> jax.Array:
    """Per-row additive term: 0.1*recency for live in-window rows, -1e30
    otherwise. Pure elementwise [N] precompute — XLA fuses it."""
    n = created.shape[0]
    rec = jnp.exp(jnp.minimum(created - now_days, 0.0) / RECENCY_HALF_LIFE_DAYS)
    rows = jnp.arange(n, dtype=jnp.int32) + row_offset
    mask = valid & (rows >= window_start)
    return jnp.where(mask, RECENCY_WEIGHT * rec, _NEG_INF)[None, :]


@functools.partial(jax.jit, static_argnames=("m", "interpret"))
def score_topm(
    emb: jax.Array,
    bloom: jax.Array,
    created: jax.Array,
    valid: jax.Array,
    q: jax.Array,
    kw_weights: jax.Array,   # f32[B, bits]
    kw_bias: jax.Array,      # f32[B]
    now_days: jax.Array,
    window_start: jax.Array,
    m: int,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Drop-in replacement for ops/xla_scorer.score_topm using the fused
    kernel. Returns (ub_values[B, m+1], row_indices[B, m+1])."""
    add_row = make_add_row(created, valid, now_days, window_start)
    ub = fused_ub_scores(
        emb, bloom, q, kw_weights, kw_bias[:, None], add_row, interpret=interpret
    )
    ub = jnp.where(ub <= _NEG_INF / 2, -jnp.inf, ub)
    return _topk_rows(ub, min(m + 1, emb.shape[0]))
