"""Fused Pallas TPU kernel for the hybrid upper-bound scan.

TPU-native replacement for the reference's per-chunk C# scoring loop
(src/OmniRecall.Api/Services/RecallSearchService.cs:28-37). One HBM pass per
query batch computes, per chunk block of C rows,

    ub[b, c] = 0.7 * (q[b] . emb[c])                            (MXU)
             + 0.2 * min(1, bits(bloom[c]) . kw_w[b] + kw_b[b]) (MXU)
             + add_row[c]   (precomputed 0.1*recency + valid/window mask)
             + PALLAS_CERT_EPS

and then extracts the block's top-(T+1) entries per query IN-KERNEL (VPU
max/mask extraction over the VMEM-resident block scores), emitting only
[B, T+1] values+indices per block. The full [B, N] score matrix never
touches HBM, and no giant sort is needed — the host-side merge does a tiny
top-k over [B, nblocks*(T+1)].

Exactness contract (engine certificate, search/engine.py):
- entries 0..T-1 per block are candidate rows; entry T is the block's
  (T+1)-th best — a sound upper bound for every unemitted row of the block.
- merged boundary = max((m+1)-th best candidate, max over block bounds);
  every row outside the returned candidate set has ub <= boundary.
- matmuls run in bf16 (inputs rounded; f32 accumulation); the certificate
  margin PALLAS_CERT_EPS covers the divergence from the float64 host oracle.
  BOTH operands round to bf16 (7 explicit mantissa bits -> per-element
  relative error <= 2^-8), so for L2-normalized operands
  |q^.c^ - q.c| <= (2^-8 + 2^-8 + 2^-16) * sum|q_i c_i| <= ~2^-7 = 0.0078,
  i.e. <= 0.0055 on the weighted cosine term, plus < 0.005 * 0.2 = 0.001 on
  the keyword term (weights sum ~<=1.2, bits exact 0/1): eps = 8e-3 covers
  the sum. (A one-operand derivation previously justified 4e-3; a vector
  with every element at a rounding-loss extreme was constructed that
  exceeds it — both operands must be counted.) A larger eps only loosens
  the upper bound — exactness is preserved via candidate escalation.

Performance notes:
- embeddings may be stored bf16 in HBM (EngineOptions.bf16_embeddings) to
  halve scan bandwidth; the kernel casts operands to bf16 regardless so the
  MXU runs at full rate,
- bloom signatures decode in-kernel from packed u8 (bit j = plane (j div W)
  of word (j mod W); the transposed-plane layout in ops/hashing.py makes the
  decode a lane-aligned concat of 8 shift-AND planes),
- chunk-block inputs stream HBM->VMEM with automatic double buffering;
  query operands have constant index maps and are hoisted out of the loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from omni_recall_tpu.ops.merge import top_k_with_payload
from omni_recall_tpu.ops.oracle import (
    COSINE_WEIGHT,
    KEYWORD_WEIGHT,
    RECENCY_HALF_LIFE_DAYS,
    RECENCY_WEIGHT,
)

_NEG_INF = -1e30  # finite mask value inside the kernel; mapped to -inf outside

# Certificate margin for the fused kernel (see module docstring derivation).
PALLAS_CERT_EPS = 8e-3
# The int8 kernels' dot products are exact integer MXU ops; quantization
# error is covered by the explicit eq/ec folding, leaving only f32 scaling
# arithmetic (~1e-6 relative) — the original smaller margin is ample there
# and keeps coarse-certificate resolution tight.
PALLAS_CERT_EPS_INT8 = 4e-3


def _ub_block(emb_ref, bloom_ref, q_ref, kw_w_ref, kw_b_ref, add_row_ref):
    """Compute the [B, C] upper-bound scores for one chunk block."""
    compute_dtype = jnp.bfloat16
    emb = emb_ref[:].astype(compute_dtype)
    q = q_ref[:].astype(compute_dtype)
    cos = jax.lax.dot_general(
        q, emb,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, C]

    words = bloom_ref[:].astype(jnp.int32)  # [C, W]
    bits = jnp.concatenate(
        [((words >> b) & 1) for b in range(8)], axis=1
    ).astype(compute_dtype)  # [C, W*8]

    kw = jax.lax.dot_general(
        kw_w_ref[:].astype(compute_dtype), bits,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, C]
    kw = jnp.minimum(kw + kw_b_ref[:], 1.0)

    return (
        COSINE_WEIGHT * cos
        + KEYWORD_WEIGHT * kw
        + add_row_ref[:]
        + PALLAS_CERT_EPS
    )


def _extract_topt(scores, c: int, sub: int, t1: int, vals_ref, idxs_ref,
                  block_base=None):
    """Emit, for every extraction sub-slice of ``sub`` rows, its top-(t1-1)
    entries plus a bound (the t1-th best of the sub-slice). Static lane
    slices keep the extraction cost independent of the matmul block size;
    the final bound iteration extracts the value only (its index is never
    read by the merge). All nt columns are buffered and written with ONE
    [B, nt] store per output ref — per-column [B, 1] stores are masked
    single-lane writes that dominated the extraction cost (~1.7 ms/scan at
    B=1536, 1M rows; measured).

    PACKED-KEY extraction (power-of-two sub): scores map through the
    monotone IEEE-f32 -> signed-i32 key transform (negatives: flip all
    non-sign bits), the low log2(sub) key bits are REPLACED by
    (sub-1 - lane), and each round is ONE i32 max + ONE equality mask —
    half the vector passes of the value/index two-reduce scheme, which
    dominated the scan at extraction depth t=4 (tools/probe_serve.py:
    28.5 ms vs the 12 ms t=1 scan at 1M x 1536).

    Soundness of the lane-bit sacrifice: emitted values decode with the
    lane bits forced to 1 — in key space ``k | (sub-1) >= key(score)`` and
    the map is monotone, so every emitted value and every bound is >= the
    true lane score (an upper bound inflated by < 2^ceil(log2(sub)) ulps,
    ~1.2e-4 relative at sub=1024 — far inside the 4e-3/8e-3 certificate
    eps). Ties in the truncated key resolve to the LOWEST lane (the
    inverted lane bits make i32 max prefer it): a truncation-tied slightly
    larger score may be emitted one round later or fall to the bound —
    still covered by an upper bound, so the engine's certificate and the
    exact host rescore are unaffected. Keys are unique per lane, so the
    equality mask removes exactly one lane per round (deterministic)."""
    b = scores.shape[0]
    n_sub = c // sub
    if block_base is None:
        block_base = pl.program_id(0) * c  # caller owns it when pipelined
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, sub), 1)
    vcols, icols = [], []
    # the packed path amortizes its 4-pass key setup over the rounds: at
    # t1=2 (top-1 + bound) the classic 2-reduce scheme is cheaper
    if sub & (sub - 1) == 0 and sub >= 2 and t1 >= 3:
        lmask = sub - 1
        s_i = jax.lax.bitcast_convert_type(scores, jnp.int32)
        key_full = s_i ^ ((s_i >> 31) & jnp.int32(0x7FFFFFFF))
        # lane-in-slice = column & (sub-1) (slices are contiguous
        # power-of-two runs), inverted so i32 max prefers the LOWEST lane
        lane_c = jax.lax.broadcasted_iota(jnp.int32, key_full.shape, 1)
        keys = (key_full & jnp.int32(~lmask)) | (
            lmask - (lane_c & jnp.int32(lmask))
        )  # [B, c]

        def decode_up(kmax):  # key -> f32 upper bound (lane bits -> 1s)
            y = kmax | jnp.int32(lmask)
            y = y ^ ((y >> 31) & jnp.int32(0x7FFFFFFF))
            return jax.lax.bitcast_convert_type(y, jnp.float32)

        for j in range(n_sub):
            k = keys[:, j * sub : (j + 1) * sub]
            for _ in range(t1 - 1):
                kmax = jnp.max(k, axis=1, keepdims=True)  # [B, 1]
                vcols.append(decode_up(kmax))
                icols.append(
                    (lmask - (kmax & jnp.int32(lmask)))
                    + (block_base + j * sub)
                )
                k = jnp.where(k == kmax, jnp.int32(-(2**31)), k)
            vcols.append(decode_up(jnp.max(k, axis=1, keepdims=True)))
            icols.append(jnp.full((b, 1), -2, dtype=jnp.int32))
        vals_ref[0] = jnp.concatenate(vcols, axis=1)
        idxs_ref[0] = jnp.concatenate(icols, axis=1)
        return
    for j in range(n_sub):
        s = scores[:, j * sub : (j + 1) * sub]
        for t in range(t1 - 1):
            v = jnp.max(s, axis=1, keepdims=True)  # [B, 1]
            # deterministic: lowest row index among ties
            hit = jnp.where(s == v, lane, sub)
            idx = jnp.min(hit, axis=1, keepdims=True)  # [B, 1]
            vcols.append(v)
            icols.append(idx + (block_base + j * sub))
            s = jnp.where(lane == idx, _NEG_INF, s)
        # bound entry: value only
        vcols.append(jnp.max(s, axis=1, keepdims=True))
        icols.append(jnp.full((b, 1), -2, dtype=jnp.int32))
    vals_ref[0] = jnp.concatenate(vcols, axis=1)
    idxs_ref[0] = jnp.concatenate(icols, axis=1)


def _make_topt_kernel(t1: int, c: int, sub: int):
    def kernel(emb_ref, bloom_ref, q_ref, kw_w_ref, kw_b_ref, add_row_ref,
               vals_ref, idxs_ref):
        scores = _ub_block(emb_ref, bloom_ref, q_ref, kw_w_ref, kw_b_ref, add_row_ref)
        _extract_topt(scores, c, sub, t1, vals_ref, idxs_ref)

    return kernel


def _make_topt_kernel_int8(t1: int, c: int, sub: int):
    def kernel(emb_ref, bloom_ref, q_ref, kw_w_ref, kw_b_ref, add_row_ref,
               scale_row_ref, q_scale_ref, q_bias_ref, vals_ref, idxs_ref):
        scores = _ub_block_int8(
            emb_ref, bloom_ref, q_ref, kw_w_ref, kw_b_ref, add_row_ref,
            scale_row_ref, q_scale_ref, q_bias_ref,
        )
        _extract_topt(scores, c, sub, t1, vals_ref, idxs_ref)

    return kernel


def _ub_block_int8(emb_ref, bloom_ref, q_ref, kw_w_ref, kw_b_ref, add_row_ref,
                   scale_row_ref, q_scale_ref, q_bias_ref):
    """int8 upper-bound scores for one chunk block.

    cos_q = (q8 . c8) * s_q[b] * s_c[c] with int32 MXU accumulation (exact);
    keyword weights are ceil-quantized on the host (w8/127 >= w, sound);
    the per-row quantization error term 0.7*(1+eq_max)*ec_norm[c] is folded
    into add_row and the per-query term 0.7*eq_norm[b] into q_bias.
    """
    cosd = jax.lax.dot_general(
        q_ref[:], emb_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)  # [B, C]
    cos = cosd * q_scale_ref[:] * scale_row_ref[:]

    words = bloom_ref[:].astype(jnp.int32)  # [C, W]
    bits = jnp.concatenate(
        [((words >> b) & 1) for b in range(8)], axis=1
    ).astype(jnp.int8)  # [C, W*8]

    kwd = jax.lax.dot_general(
        kw_w_ref[:], bits,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)  # [B, C]
    kw = jnp.minimum(kwd * (1.0 / 127.0) + kw_b_ref[:], 1.0)

    return (
        COSINE_WEIGHT * cos
        + KEYWORD_WEIGHT * kw
        + add_row_ref[:]
        + q_bias_ref[:]
        + PALLAS_CERT_EPS_INT8
    )


def _pick_block(n: int, itemsize: int = 4) -> int:
    """Largest chunk block that divides n and fits the VMEM budget
    (~2 double-buffered emb blocks + the decoded bloom bits)."""
    candidates = (2048, 1024, 512, 256, 128) if itemsize <= 2 else (1024, 512, 256, 128)
    for c in candidates:
        if n % c == 0:
            return c
    return 0


def _pick_block_coarse(n: int) -> int:
    """Block size for the coarse (no-bloom) kernel: without the decoded
    [C, 8W] bit matrix in VMEM, larger chunk blocks fit and amortize the
    per-block extraction better."""
    for c in (2048, 1024, 512, 256, 128):
        if n % c == 0:
            return c
    return 0


def _make_topt_kernel_int8_coarse(t1: int, c: int, sub: int):
    """Cosine-only int8 scan: the keyword term is replaced by a per-query
    sound cap folded into q_bias (see score_topm_int8_coarse). Skipping the
    bloom decode + [B, bits] matmul cuts per-query scan work from
    2N(d + bits) to 2Nd ops — the keyword matmul at bits=1024 is wider than
    the cosine matmul itself (VERDICT r1 weak #2).

    q_scale arrives pre-multiplied by the 0.7 cosine weight (one fewer
    [B, C] multiply). The [B, C] scores materialize in VMEM — measured
    faster than per-sub-slice matmuls (a 512-col dot under-fills the MXU
    pipeline at this d)."""

    def kernel(emb_ref, q_ref, add_row_ref, scale_row_ref, q_scale_ref,
               q_bias_ref, vals_ref, idxs_ref):
        cosd = jax.lax.dot_general(
            q_ref[:], emb_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)  # [B, C]
        scores = (
            cosd * q_scale_ref[:] * scale_row_ref[:]
            + add_row_ref[:]
            + q_bias_ref[:]
            + PALLAS_CERT_EPS_INT8
        )
        _extract_topt(scores, c, sub, t1, vals_ref, idxs_ref)

    return kernel


def _make_topt_kernel_int8_coarse_keys(t1: int, c: int, sub: int):
    """Packed-emit variant of the coarse kernel: ONE i32 output holding
    the raw packed keys of the _extract_topt packed path (value bits with
    the low log2(sub) bits replaced by the inverted lane). The pair
    kernel's (vals, idxs) outputs pad their tiny [*, n_sub*t1] last dim to
    128 lanes — 10-40x HBM write amplification (~805 MB per 1M serving
    batch, measured ~2 ms); the single-key emit halves it, and the caller
    decodes value + global index in XLA (_decode_keys) BIT-IDENTICALLY to
    the in-kernel decode (same decode_up / lane arithmetic, so the
    soundness note in _extract_topt applies verbatim). Requires the packed
    path's conditions: power-of-two ``sub`` and t1 >= 3."""
    assert sub & (sub - 1) == 0 and t1 >= 3

    def kernel(emb_ref, q_ref, add_row_ref, scale_row_ref, q_scale_ref,
               q_bias_ref, keys_ref):
        cosd = jax.lax.dot_general(
            q_ref[:], emb_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)  # [B, C]
        scores = (
            cosd * q_scale_ref[:] * scale_row_ref[:]
            + add_row_ref[:]
            + q_bias_ref[:]
            + PALLAS_CERT_EPS_INT8
        )
        b = scores.shape[0]
        n_sub = c // sub
        lmask = sub - 1
        s_i = jax.lax.bitcast_convert_type(scores, jnp.int32)
        key_full = s_i ^ ((s_i >> 31) & jnp.int32(0x7FFFFFFF))
        lane_c = jax.lax.broadcasted_iota(jnp.int32, key_full.shape, 1)
        keys = (key_full & jnp.int32(~lmask)) | (
            lmask - (lane_c & jnp.int32(lmask))
        )
        cols = []
        for j in range(n_sub):
            k = keys[:, j * sub : (j + 1) * sub]
            for _ in range(t1 - 1):
                kmax = jnp.max(k, axis=1, keepdims=True)
                cols.append(kmax)
                k = jnp.where(k == kmax, jnp.int32(-(2**31)), k)
            cols.append(jnp.max(k, axis=1, keepdims=True))  # slice bound
        keys_ref[0] = jnp.concatenate(cols, axis=1)

    return kernel


def _make_topt_kernel_int8_coarse_keys_t(t1: int, c: int, sub: int,
                                         nt_pad: int):
    """TRANSPOSED packed-emit coarse kernel (VERDICT r4 #3): scores are
    computed [C, B] (chunk rows on sublanes, queries on lanes) so each
    extraction round's max reduces across SUBLANES to a [1, B] row and the
    emitted block is [n_sub*t1 (pad 8), B] — the minor dimension is the
    query batch, which is already lane-aligned. The pair/packed layouts
    emit [B, n_sub*t1] whose tiny minor dim pads to 128 lanes: 805 MB /
    402 MB of HBM writes per 1M serving batch (~21x / ~10x amplification)
    vs ~25 MB here, and the r4 packed-emit experiment showed the XLA
    decode of the padded layout costs more than the halved writes saved.

    Value semantics are IDENTICAL to the packed path: the same monotone
    f32->i32 key transform, the same lane-bit sacrifice (position within
    the sub-slice rides the low key bits, inverted so i32 max prefers the
    lowest row), the same per-round max+mask — max is order-independent
    and keys are unique per position, so each round's winner matches the
    [B, C] layout's winner bit for bit. The f32 score arithmetic keeps the
    exact op order of the other kernels ((cosd * q_scale) * scale_row +
    add_row + q_bias + eps), so scores are elementwise bit-identical too;
    _extract_topt's soundness note applies verbatim."""
    assert sub & (sub - 1) == 0 and t1 >= 3

    def kernel(emb_ref, q_ref, add_row_ref, scale_row_ref, q_scale_ref,
               q_bias_ref, keys_ref):
        cosd = jax.lax.dot_general(
            emb_ref[:], q_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)  # [C, B]
        # aux inputs arrive in the STANDARD layouts ([1, C] per-row terms,
        # [B, 1] per-query terms) and transpose per block IN VMEM: a
        # host-side [N, 1] reshape tiles as T(8,128) with a 128x lane-pad
        # (f32[10485760,1] = 5 GB — measured HBM OOM at the 10M config)
        scores = (
            cosd
            * q_scale_ref[:].reshape(1, -1)
            * scale_row_ref[:].reshape(-1, 1)
            + add_row_ref[:].reshape(-1, 1)
            + q_bias_ref[:].reshape(1, -1)
            + PALLAS_CERT_EPS_INT8
        )
        n_sub = c // sub
        lmask = sub - 1
        s_i = jax.lax.bitcast_convert_type(scores, jnp.int32)
        key_full = s_i ^ ((s_i >> 31) & jnp.int32(0x7FFFFFFF))
        pos_r = jax.lax.broadcasted_iota(jnp.int32, key_full.shape, 0)
        keys = (key_full & jnp.int32(~lmask)) | (
            lmask - (pos_r & jnp.int32(lmask))
        )  # [C, B]
        cols = []
        for j in range(n_sub):
            k = keys[j * sub : (j + 1) * sub, :]
            for _ in range(t1 - 1):
                kmax = jnp.max(k, axis=0, keepdims=True)  # [1, B]
                cols.append(kmax)
                k = jnp.where(k == kmax, jnp.int32(-(2**31)), k)
            cols.append(jnp.max(k, axis=0, keepdims=True))  # slice bound
        out = jnp.concatenate(cols, axis=0)  # [n_sub*t1, B]
        if nt_pad > n_sub * t1:
            out = jnp.pad(out, ((0, nt_pad - n_sub * t1), (0, 0)))
        keys_ref[0] = out

    return kernel


def _decode_keys_t(keys: jax.Array, sub: int, t1: int, nt: int):
    """Decode the transposed packed emit to the pair kernels' (vals, idxs)
    contract. keys: [nblocks, nt_pad, B] i32. The decode math is
    _decode_keys' verbatim (decode_up lane-bit inflation, inverted low
    bits, global base), evaluated in the transposed layout so no padded
    intermediate ever materializes; ONE clean 2D [nblocks*nt, B] ->
    [B, nblocks*nt] transpose at the end lands the merge's query-major
    layout (minor dims divisible by 128 on both sides)."""
    nblocks, nt_pad, b = keys.shape
    n_sub = nt // t1
    lmask = sub - 1
    k2 = keys[:, :nt, :].reshape(nblocks * nt, b)
    y = k2 | jnp.int32(lmask)
    y = y ^ ((y >> 31) & jnp.int32(0x7FFFFFFF))
    vals_t = jax.lax.bitcast_convert_type(y, jnp.float32)
    lane = lmask - (k2 & jnp.int32(lmask))
    flat = jax.lax.broadcasted_iota(jnp.int32, (nblocks * nt, b), 0)
    blk = flat // nt
    slot = flat % nt
    base = blk * (n_sub * sub) + (slot // t1) * sub
    is_bound = (slot % t1) == (t1 - 1)
    idxs_t = jnp.where(is_bound, jnp.int32(-2), lane + base)
    vals = jnp.transpose(vals_t, (1, 0)).reshape(b, nblocks * n_sub, t1)
    idxs = jnp.transpose(idxs_t, (1, 0)).reshape(b, nblocks * n_sub, t1)
    return vals, idxs


def _decode_keys(keys: jax.Array, sub: int, t1: int):
    """Decode the packed-key emit to the pair kernels' (vals, idxs)
    contract — [B, slices, t1] each, idx -2 on bound entries — with
    EXACTLY the packed path's decode (decode_up forces lane bits to 1:
    sound upper bounds inflated < sub ulps; index = inverted low bits +
    the slice's global base). keys: [nblocks, B, n_sub*t1] i32."""
    nblocks, b, nt = keys.shape
    n_sub = nt // t1
    lmask = sub - 1
    y = keys | jnp.int32(lmask)
    y = y ^ ((y >> 31) & jnp.int32(0x7FFFFFFF))
    vals = jax.lax.bitcast_convert_type(y, jnp.float32)
    lane = lmask - (keys & jnp.int32(lmask))
    # global base of column (i, s): i*c + (s // t1)*sub; bound entries
    # (s % t1 == t1-1) carry idx -2 (never read by the merge)
    slot = jax.lax.broadcasted_iota(jnp.int32, (nblocks, b, nt), 2)
    blk = jax.lax.broadcasted_iota(jnp.int32, (nblocks, b, nt), 0)
    base = blk * (n_sub * sub) + (slot // t1) * sub
    idxs = jnp.where(
        slot % t1 == t1 - 1, jnp.int32(-2), base + lane
    )
    vals = jnp.transpose(vals, (1, 0, 2)).reshape(b, nblocks * n_sub, t1)
    idxs = jnp.transpose(idxs, (1, 0, 2)).reshape(b, nblocks * n_sub, t1)
    return vals, idxs


def _make_topt_kernel_kw_only(t1: int, c: int, sub: int):
    """Bloom-only scan for keyword-only queries (empty query embedding):
    their cosine term is EXACTLY 0 (RecallSearchService.cs:70-71), so
    skipping the [B,d]x[d,C] matmul and the emb stream is lossless — scan
    work drops from 2N(d + bits) to 2N*bits ops and the HBM stream from
    N(d + W) to N*W bytes. The default out-of-box config
    (Embeddings:Provider=None) serves EVERY query through this kernel."""

    def kernel(bloom_ref, kw_w_ref, kw_b_ref, add_row_ref, vals_ref, idxs_ref):
        words = bloom_ref[:].astype(jnp.int32)  # [C, W]
        bits = jnp.concatenate(
            [((words >> b) & 1) for b in range(8)], axis=1
        ).astype(jnp.int8)  # [C, W*8]
        kwd = jax.lax.dot_general(
            kw_w_ref[:], bits,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)  # [B, C]
        kw = jnp.minimum(kwd * (1.0 / 127.0) + kw_b_ref[:], 1.0)
        scores = KEYWORD_WEIGHT * kw + add_row_ref[:] + PALLAS_CERT_EPS_INT8
        _extract_topt(scores, c, sub, t1, vals_ref, idxs_ref)

    return kernel


@functools.partial(jax.jit, static_argnames=("t", "sub", "interpret"))
def block_topt_kw_only(
    bloom: jax.Array,        # u8 [N, W]
    kw_weights8: jax.Array,  # i8 [B, bits] (ceil-quantized)
    kw_bias: jax.Array,      # f32 [B, 1]
    add_row: jax.Array,      # f32 [1, N] (0.1*rec + valid/window mask; NO
                             # cosine error term — cosine is exactly 0)
    t: int,
    sub: int = 512,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Keyword-only scan. Same output contract as block_topt_int8."""
    n, w = bloom.shape
    b = kw_weights8.shape[0]
    c = _pick_block(n, 1)
    if c == 0:
        raise ValueError(f"row count {n} not divisible by a supported block")
    if w < 128 and c > 1024:
        # narrow bloom planes (< 128 lanes) pad each of the 8 decode planes
        # to full lanes in VMEM; at block 2048 the scoped allocation blows
        # the 16 MB limit (measured: bits=512/B=1536 OOMs at 18.2 MB while
        # bits=1024 fits). Halving the block restores ample slack.
        c = 1024
    sub = min(sub, c)
    t1 = min(t + 1, sub)
    n_sub = c // sub
    nblocks = n // c

    kernel = pl.pallas_call(
        _make_topt_kernel_kw_only(t1, c, sub),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((c, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, w * 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, b, n_sub * t1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, n_sub * t1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nblocks, b, n_sub * t1), jnp.float32),
            jax.ShapeDtypeStruct((nblocks, b, n_sub * t1), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * b * w * 8,
            bytes_accessed=n * w + b * nblocks * n_sub * t1 * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )
    vals, idxs = kernel(bloom, kw_weights8, kw_bias, add_row)
    vals = jnp.transpose(vals, (1, 0, 2)).reshape(b, nblocks * n_sub, t1)
    idxs = jnp.transpose(idxs, (1, 0, 2)).reshape(b, nblocks * n_sub, t1)
    return vals, idxs


@functools.partial(jax.jit, static_argnames=("m", "t", "sub", "interpret"))
def score_topm_kw_only(
    bloom: jax.Array,
    created: jax.Array,
    valid: jax.Array,
    kw_weights: jax.Array,   # f32[B, bits]
    kw_bias: jax.Array,      # f32[B]
    now_days: jax.Array,
    window_start: jax.Array,
    m: int,
    t: int = 8,
    sub: int = 512,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Keyword-only scan entry: sound upper bounds for queries WITHOUT an
    embedding (their cosine is exactly 0, so no emb read, no quantization
    error term — the add_row is tighter than the hybrid kernels')."""
    add_row = make_add_row(created, valid, now_days, window_start)
    kw_w8 = quantize_kw_weights(kw_weights)
    vals, idxs = block_topt_kw_only(
        bloom, kw_w8, kw_bias[:, None], add_row,
        t=t, sub=sub, interpret=interpret,
    )
    return _merge_topm(vals, idxs, m)


@functools.partial(jax.jit, static_argnames=(
    "t", "sub", "interpret", "block", "emit_keys",
))
def block_topt_int8_coarse(
    emb8: jax.Array,        # i8 [N, d]
    q8: jax.Array,          # i8 [B, d]
    add_row: jax.Array,     # f32 [1, N] (0.1*rec + 0.7*(1+eq_max)*ec + mask)
    scale_row: jax.Array,   # f32 [1, N]
    q_scale: jax.Array,     # f32 [B, 1]
    q_bias: jax.Array,      # f32 [B, 1] (0.7*eq + 0.2*min(1, sum_w + bias))
    t: int,
    sub: int = 512,
    interpret: bool = False,
    block: int | None = None,
    emit_keys: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Coarse (keyword-capped) int8 scan. Same output contract as
    block_topt_int8; every emitted value/bound is a sound upper bound on the
    TRUE hybrid score because the keyword term is bounded by its per-query
    maximum (RecallSearchService.cs:90-113 keyword score is <= 1 by
    construction; sum_w + bias bounds it from above per query)."""
    n, d = emb8.shape
    b = q8.shape[0]
    c = block if block is not None and n % block == 0 else _pick_block_coarse(n)
    if c == 0:
        raise ValueError(f"row count {n} not divisible by a supported block")
    if b >= 1024 and t > 2 and c > 1024 and n % 1024 == 0 and block is None:
        # deep extraction at throughput batches: the per-round masked score
        # copies live alongside the [B, C] tile — halve the block to stay
        # inside scoped VMEM (the t=1 sweep optimum B=1536/C=2048 sits at
        # the 16 MB limit already)
        c = 1024
    sub = min(sub, c)
    t1 = min(t + 1, sub)
    n_sub = c // sub
    nblocks = n // c
    q_scale = COSINE_WEIGHT * q_scale  # folded into the kernel's scale product

    # NOTE: a software-pipelined variant (MXU block k overlapping VPU
    # extraction of block k-1 via two-slot scratch) was tried and REVERTED:
    # honest megastep timing (f32-perturbed carry; an int8 carry injection
    # gets constant-folded and the scan hoists the loop-invariant kernel,
    # under-reporting by the chain length) measured it at 51.6 ms/batch vs
    # 27.5 baseline at (1M, 768, b=1536, t=4) — the two-slot scratch serves
    # VPU reads from the same VMEM ports the extraction already saturates,
    # so deferring the dependency only added traffic. tools/probe_pipe.py
    # keeps the prototype + the measurement-artifact note.
    if emit_keys == "t" and sub & (sub - 1) == 0 and t1 >= 3:
        # TRANSPOSED packed emit: [nblocks, n_sub*t1 (pad 8), B] — the
        # minor dim is the query batch, killing the 128-lane padding
        # amplification entirely (kernel docstring; bit-identical decode)
        nt = n_sub * t1
        nt_pad = ((nt + 7) // 8) * 8
        keys = pl.pallas_call(
            _make_topt_kernel_int8_coarse_keys_t(t1, c, sub, nt_pad),
            grid=(nblocks,),
            in_specs=[
                pl.BlockSpec((c, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, nt_pad, b), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((nblocks, nt_pad, b), jnp.int32),
            cost_estimate=pl.CostEstimate(
                flops=2 * n * b * d,
                bytes_accessed=n * d + nblocks * nt_pad * b * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(emb8, q8, add_row, scale_row, q_scale, q_bias)
        return _decode_keys_t(keys, sub, t1, nt)
    if emit_keys and sub & (sub - 1) == 0 and t1 >= 3:
        # single packed-i32 emit + XLA decode (_decode_keys): halves the
        # kernel's padded output writes, bit-identical results
        keys = pl.pallas_call(
            _make_topt_kernel_int8_coarse_keys(t1, c, sub),
            grid=(nblocks,),
            in_specs=[
                pl.BlockSpec((c, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, b, n_sub * t1), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((nblocks, b, n_sub * t1), jnp.int32),
            cost_estimate=pl.CostEstimate(
                flops=2 * n * b * d,
                bytes_accessed=n * d + b * nblocks * n_sub * t1 * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(emb8, q8, add_row, scale_row, q_scale, q_bias)
        return _decode_keys(keys, sub, t1)
    kernel = pl.pallas_call(
        _make_topt_kernel_int8_coarse(t1, c, sub),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((c, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, b, n_sub * t1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, n_sub * t1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nblocks, b, n_sub * t1), jnp.float32),
            jax.ShapeDtypeStruct((nblocks, b, n_sub * t1), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * b * d,
            bytes_accessed=n * d + b * nblocks * n_sub * t1 * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )
    vals, idxs = kernel(emb8, q8, add_row, scale_row, q_scale, q_bias)
    vals = jnp.transpose(vals, (1, 0, 2)).reshape(b, nblocks * n_sub, t1)
    idxs = jnp.transpose(idxs, (1, 0, 2)).reshape(b, nblocks * n_sub, t1)
    return vals, idxs


@functools.partial(jax.jit, static_argnames=("t", "sub", "interpret"))
def block_topt(
    emb: jax.Array,        # f32|bf16 [N, d]
    bloom: jax.Array,      # u8 [N, W]
    q: jax.Array,          # f32 [B, d]
    kw_weights: jax.Array,  # f32 [B, bits]
    kw_bias: jax.Array,     # f32 [B, 1]
    add_row: jax.Array,     # f32 [1, N]
    t: int,                 # candidates per extraction sub-slice
    sub: int = 512,         # extraction sub-slice rows
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Returns (vals f32[B, n_slices, t+1], idxs i32[B, n_slices, t+1]) where
    n_slices = N / sub; entry t of each slice is the slice bound."""
    n, d = emb.shape
    b = q.shape[0]
    w = bloom.shape[1]
    c = _pick_block(n, emb.dtype.itemsize)
    if c == 0:
        raise ValueError(f"row count {n} not divisible by a supported block")
    sub = min(sub, c)
    t1 = min(t + 1, sub)
    n_sub = c // sub
    nblocks = n // c

    grid = (nblocks,)
    kernel = pl.pallas_call(
        _make_topt_kernel(t1, c, sub),
        grid=grid,
        in_specs=[
            pl.BlockSpec((c, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, w * 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            # last-dim equals the full array dim -> allowed block shape
            pl.BlockSpec((1, b, n_sub * t1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, n_sub * t1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nblocks, b, n_sub * t1), jnp.float32),
            jax.ShapeDtypeStruct((nblocks, b, n_sub * t1), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * b * (d + w * 8),
            bytes_accessed=n * d * emb.dtype.itemsize + n * w + b * nblocks * n_sub * t1 * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )
    vals, idxs = kernel(emb, bloom, q, kw_weights, kw_bias, add_row)
    # [nb, B, n_sub*t1] -> [B, nb*n_sub, t1]
    vals = jnp.transpose(vals, (1, 0, 2)).reshape(b, nblocks * n_sub, t1)
    idxs = jnp.transpose(idxs, (1, 0, 2)).reshape(b, nblocks * n_sub, t1)
    return vals, idxs


def make_add_row(
    created: jax.Array, valid: jax.Array, now_days, window_start, row_offset=0,
    err_term: jax.Array | None = None,
) -> jax.Array:
    """Per-row additive term: 0.1*recency (+ optional per-row quantization
    error bound) for live in-window rows, -1e30 otherwise. Pure elementwise
    [N] precompute — XLA fuses it."""
    n = created.shape[0]
    rec = jnp.exp(jnp.minimum(created - now_days, 0.0) / RECENCY_HALF_LIFE_DAYS)
    live = RECENCY_WEIGHT * rec
    if err_term is not None:
        live = live + err_term
    rows = jnp.arange(n, dtype=jnp.int32) + row_offset
    mask = valid & (rows >= window_start)
    return jnp.where(mask, live, _NEG_INF)[None, :]


@functools.partial(jax.jit, static_argnames=("t", "sub", "interpret"))
def block_topt_int8(
    emb8: jax.Array,        # i8 [N, d]
    bloom: jax.Array,       # u8 [N, W]
    q8: jax.Array,          # i8 [B, d]
    kw_weights8: jax.Array,  # i8 [B, bits] (ceil-quantized)
    kw_bias: jax.Array,      # f32 [B, 1]
    add_row: jax.Array,      # f32 [1, N] (incl. 0.7*(1+eq_max)*ec_norm)
    scale_row: jax.Array,    # f32 [1, N] per-row dequant scale
    q_scale: jax.Array,      # f32 [B, 1] per-query dequant scale
    q_bias: jax.Array,       # f32 [B, 1] 0.7*eq_norm per query
    t: int,
    sub: int = 512,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """int8 variant of block_topt (int32 MXU accumulation, exact)."""
    n, d = emb8.shape
    b = q8.shape[0]
    w = bloom.shape[1]
    c = _pick_block(n, 1)
    if c == 0:
        raise ValueError(f"row count {n} not divisible by a supported block")
    # VMEM cap: the fused kernel holds the [B, C] f32 scores tile, the
    # decoded [C, 8W] bit planes (i32 intermediates) and the double-buffered
    # emb/bloom blocks in scoped VMEM — at B=448/C=2048/bits=1024 that is
    # 18.4 MB vs the 16 MB limit (measured Mosaic stack OOM). Halve the
    # block at serving batch sizes; the matmul stays MXU-bound.
    if b >= 1024 and c > 512:
        c = 512
    elif b >= 256 and c > 1024:
        c = 1024
    sub = min(sub, c)
    t1 = min(t + 1, sub)
    n_sub = c // sub
    nblocks = n // c

    kernel = pl.pallas_call(
        _make_topt_kernel_int8(t1, c, sub),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((c, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, w * 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, b, n_sub * t1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, n_sub * t1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nblocks, b, n_sub * t1), jnp.float32),
            jax.ShapeDtypeStruct((nblocks, b, n_sub * t1), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * b * (d + w * 8),
            bytes_accessed=n * d + n * w + b * nblocks * n_sub * t1 * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )
    vals, idxs = kernel(
        emb8, bloom, q8, kw_weights8, kw_bias, add_row, scale_row, q_scale, q_bias
    )
    vals = jnp.transpose(vals, (1, 0, 2)).reshape(b, nblocks * n_sub, t1)
    idxs = jnp.transpose(idxs, (1, 0, 2)).reshape(b, nblocks * n_sub, t1)
    return vals, idxs


@functools.partial(jax.jit, static_argnames=("m", "t", "sub", "interpret"))
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
    t: int = 8,
    sub: int = 512,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Interface-compatible with ops/xla_scorer.score_topm: returns
    (ub_values[B, m+1], row_indices[B, m+1]) where entry m is the certificate
    boundary (its index is -1: it bounds unemitted rows, it is not a
    candidate). Requires m <= nblocks * t (the engine falls back to the exact
    XLA scorer otherwise)."""
    add_row = make_add_row(created, valid, now_days, window_start)
    vals, idxs = block_topt(
        emb, bloom, q, kw_weights, kw_bias[:, None], add_row,
        t=t, sub=sub, interpret=interpret,
    )  # [B, nb, t1]
    return _merge_topm(vals, idxs, m)


def _merge_topm(vals: jax.Array, idxs: jax.Array, m: int) -> tuple[jax.Array, jax.Array]:
    b, nb, t1 = vals.shape
    t_eff = t1 - 1
    if m > nb * t_eff:
        raise ValueError(f"m={m} exceeds emitted candidates nblocks*t={nb * t_eff}")

    cand_vals = vals[:, :, :t_eff].reshape(b, nb * t_eff)
    cand_idxs = idxs[:, :, :t_eff].reshape(b, nb * t_eff)
    block_bounds = vals[:, :, t_eff]  # [B, nb]

    k = min(m + 1, nb * t_eff)
    top_v, top_i = top_k_with_payload(cand_vals, cand_idxs, k)

    top_v = jnp.where(top_v <= _NEG_INF / 2, -jnp.inf, top_v)
    boundary_emitted = top_v[:, m] if k > m else jnp.full((b,), -jnp.inf)
    block_bound_max = jnp.max(
        jnp.where(block_bounds <= _NEG_INF / 2, -jnp.inf, block_bounds), axis=1
    )
    boundary = jnp.maximum(boundary_emitted, block_bound_max)

    out_v = jnp.concatenate([top_v[:, :m], boundary[:, None]], axis=1)
    out_i = jnp.concatenate(
        [top_i[:, :m], jnp.full((b, 1), -1, dtype=jnp.int32)], axis=1
    )
    return out_v, out_i


@functools.partial(jax.jit, static_argnames=("m", "t", "sub", "interpret"))
def score_topm_int8(
    emb8: jax.Array,         # i8[N, d]
    scale_row: jax.Array,    # f32[N] per-row dequant scale
    err_row: jax.Array,      # f32[N] per-row quantization error norm
    bloom: jax.Array,        # u8[N, W]
    created: jax.Array,
    valid: jax.Array,
    q: jax.Array,            # f32[B, d] normalized query embeddings
    kw_weights: jax.Array,   # f32[B, bits]
    kw_bias: jax.Array,      # f32[B]
    now_days: jax.Array,
    window_start: jax.Array,
    m: int,
    t: int = 8,
    sub: int = 512,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """int8 scan variant of score_topm. Queries are quantized on the fly;
    per-row/-query quantization error bounds keep the upper bound sound
    (see ops/quantize.py)."""
    # exact f32 math gives a value within 1 ulp of the true error norm;
    # quantize_queries_int8 scales by (1 + 1e-6) so the bound is never
    # optimistic
    q8, q_scale, eq, err_term = prepare_int8_query(q, err_row)
    add_row = make_add_row(created, valid, now_days, window_start, err_term=err_term)
    q_bias = COSINE_WEIGHT * eq

    kw_w8 = quantize_kw_weights(kw_weights)

    vals, idxs = block_topt_int8(
        emb8, bloom, q8, kw_w8, kw_bias[:, None], add_row,
        scale_row[None, :], q_scale, q_bias,
        t=t, sub=sub, interpret=interpret,
    )
    return _merge_topm(vals, idxs, m)


def prepare_int8_query(q: jax.Array, err_row: jax.Array):
    """Quantize queries + fold the sound error terms. THE single source of
    the int8 certificate's error construction — the single-device scans
    (score_topm_int8 / _coarse) and the sharded path
    (parallel/sharded.py _local_pallas) must all build their bounds here,
    or a future change leaves one path with an unsound bound.

    Returns (q8, q_scale, eq, err_term) with
    err_term = COSINE_WEIGHT * (1 + max(eq)) * err_row — covers
    |q.dc| + |dq.c_hat| for the quantization deltas (ops/quantize.py)."""
    q8, q_scale, eq = quantize_queries_int8(q)
    err_term = COSINE_WEIGHT * (1.0 + jnp.max(eq)) * err_row
    return q8, q_scale, eq, err_term


def coarse_q_bias(eq, kw_weights, kw_bias):
    """Per-query additive bias of the coarse scan: the cosine quantization
    error plus the keyword cap KEYWORD_WEIGHT*min(1, sum_w + bias). Note
    query_bit_weights distributes exactly 1/T mass per term, so sum_w (+
    stopword-fallback bias) is 1 for every query WITH terms — the cap is
    effectively a flat KEYWORD_WEIGHT for termful queries and 0 otherwise;
    coarse resolution therefore rides on cosine separation. Shared by the
    single-device and sharded coarse paths (soundness-critical)."""
    kw_cap = jnp.minimum(jnp.sum(kw_weights, axis=1) + kw_bias, 1.0)[:, None]
    return COSINE_WEIGHT * eq + KEYWORD_WEIGHT * kw_cap


def quantize_kw_weights(kw_weights: jax.Array) -> jax.Array:
    """Ceil-quantize keyword weights to int8 (w8/127 >= w: sound).
    Shared by the single-device and sharded full-fused int8 paths."""
    return jnp.clip(jnp.ceil(kw_weights * 127.0), 0, 127).astype(jnp.int8)


def quantize_queries_int8(q: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Per-query symmetric int8 quantization + sound error-norm bound
    (shared by the full and coarse int8 scans)."""
    q_absmax = jnp.max(jnp.abs(q), axis=1, keepdims=True)  # [B, 1]
    q_scale = q_absmax / 127.0
    safe = jnp.where(q_scale > 0, q_scale, 1.0)
    q8 = jnp.clip(jnp.round(q / safe), -127, 127).astype(jnp.int8)
    eq = jnp.linalg.norm(q - q8.astype(jnp.float32) * q_scale, axis=1, keepdims=True)
    eq = eq * (1.0 + 1e-6)
    return q8, q_scale, eq


@functools.partial(jax.jit, static_argnames=(
    "m", "t", "sub", "interpret", "emit_keys",
))
def score_topm_int8_coarse(
    emb8: jax.Array,         # i8[N, d]
    scale_row: jax.Array,    # f32[N]
    err_row: jax.Array,      # f32[N]
    created: jax.Array,
    valid: jax.Array,
    q: jax.Array,            # f32[B, d]
    kw_weights: jax.Array,   # f32[B, bits] (only its row-sums are used)
    kw_bias: jax.Array,      # f32[B]
    now_days: jax.Array,
    window_start: jax.Array,
    m: int,
    t: int = 8,
    sub: int = 512,
    interpret: bool = False,
    emit_keys: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Coarse int8 scan: cosine + recency computed, keyword bounded by
    0.2 * min(1, sum(weights) + bias) per query (a sound upper bound on the
    bloom keyword score, which itself bounds the reference's substring
    score; note the cap is effectively FLAT — see coarse_q_bias). The
    engine certifies the result exactly as with the full kernel; queries
    whose certificate fails escalate to the full fused scan."""
    q8, q_scale, eq, err_term = prepare_int8_query(q, err_row)
    add_row = make_add_row(created, valid, now_days, window_start, err_term=err_term)
    q_bias = coarse_q_bias(eq, kw_weights, kw_bias)

    vals, idxs = block_topt_int8_coarse(
        emb8, q8, add_row, scale_row[None, :], q_scale, q_bias,
        t=t, sub=sub, interpret=interpret, emit_keys=emit_keys,
    )
    return _merge_topm(vals, idxs, m)
