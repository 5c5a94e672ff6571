#!/usr/bin/env python
"""Headline benchmark: hybrid-search throughput at 1M chunks on one chip.

Measures the device scan path of /api/recall/search — the fused Pallas
upper-bound kernel (cosine + bloom keyword + recency) plus the two-stage
top-M candidate selection — over a 1M x 768 HBM-resident index with batched
queries, the workload defined by BASELINE.json's north star (>=100k QPS,
p50 < 10 ms at 1M chunks on one v5e chip).

Timing protocol: the dev tunnel to the chip adds ~2 ms of RPC overhead per
dispatched program and its block_until_ready is unreliable, so the bench
chains G query batches inside ONE jitted lax.scan megastep (each batch's
queries depend on the previous batch's results, forcing serialization on
device), runs T chained megasteps, and forces completion with a single tiny
readback. QPS = B*G*T / elapsed.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": "qps", "vs_baseline": value/100000}
"""

from __future__ import annotations

import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_e2e(n: int, d: int, b: int, bits: int, batches: int = 4) -> dict:
    """End-to-end engine throughput: device scan + certificate + host
    float64 rescore + ranking, via engine.search_batch over a bulk-loaded
    synthetic index. Includes the dev tunnel's per-dispatch RPC overhead
    (absent in production serving)."""
    from datetime import timedelta

    from omni_recall_tpu.config import EngineOptions
    from omni_recall_tpu.index.device_index import EPOCH, DeviceIndex
    from omni_recall_tpu.index.records import ChunkRecord
    from omni_recall_tpu.index.store import InMemoryIngestionStore
    from omni_recall_tpu.search.engine import RecallEngine

    from omni_recall_tpu.ops import hashing

    rng = np.random.default_rng(0)
    # cluster-structured corpus (real corpora have topic structure;
    # isotropic noise would make every score a near-tie and — correctly —
    # drive the exactness certificate to full scans). Chunk contents carry
    # their cluster token and blooms are the REAL signatures of those
    # contents (vectorized via one signature per cluster), so the device
    # keyword bound is sound and tight against the host rescore.
    n_clusters = 4096
    centers = rng.standard_normal((n_clusters, d), dtype=np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, n_clusters, size=n)
    noise = rng.standard_normal((n, d), dtype=np.float32)
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    spread = rng.uniform(0.2, 0.8, size=(n, 1)).astype(np.float32)
    emb = centers[assign] + spread * noise
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)

    contents = [f"topic c{cid}x synthetic chunk" for cid in range(n_clusters)]
    created_days = np.linspace(0.0, 365.0, n).astype(np.float32)
    day_cache = {}
    meta = []
    for i in range(n):
        day = round(float(created_days[i]), 3)
        when = day_cache.get(day)
        if when is None:
            when = day_cache[day] = EPOCH + timedelta(days=day)
        meta.append(
            ChunkRecord(
                id=f"s:{i}", document_id="synthetic", chunk_index=i,
                content=contents[assign[i]],
                embedding=emb[i], created_at_utc=when, seq=i,
            )
        )
    opts = EngineOptions(
        backend="pallas", embedding_dim=d, recent_window=0,
        candidate_m=128, bloom_bits=bits, scan_dtype="int8",
        capacity_block=max(8192, n // 64),
    )
    engine = RecallEngine(InMemoryIngestionStore(), options=opts)
    # signatures MUST use the index's exact bloom params (bits/ngram/hashes)
    # or the device keyword score is not a sound upper bound (bulk_load
    # asserts the width; ngram/hashes are taken from the live index here)
    dix = engine.device_index
    cluster_sigs = np.stack([
        hashing.chunk_signature(content.lower(), dix.bloom_bits, dix.ngram,
                                dix.bloom_hashes)
        for content in contents
    ])
    bloom = cluster_sigs[assign]
    engine.device_index.bulk_load(emb, bloom, created_days, meta)
    engine.device_index.device_arrays()  # quantize + upload once

    def make_requests(seed):
        # queries target a cluster center (clear relevance structure); the
        # query text is the cluster token, so keyword scores discriminate
        # exactly like real retrieval (blooms are real content signatures)
        r = np.random.default_rng(seed)
        reqs = []
        for i in range(b):
            cluster = int(r.integers(n_clusters))
            qn = r.standard_normal(d).astype(np.float32)
            qn /= np.linalg.norm(qn)
            q = centers[cluster] + 0.2 * qn
            q /= np.linalg.norm(q)
            reqs.append((f"c{cluster}x", q, 10))
        return reqs

    now = EPOCH + timedelta(days=365.0)
    engine.search_batch(make_requests(99), now=now)  # warmup/compile
    start = time.perf_counter()
    total_hits = 0
    for i in range(batches):
        results = engine.search_batch(make_requests(i), now=now)
        total_hits += sum(len(h) for h in results)
    elapsed = time.perf_counter() - start
    assert total_hits == batches * b * 10

    # Host-rescore throughput in isolation (no device round trip): the dev
    # tunnel adds ~1s of readback latency per dispatch that does not exist
    # in production, so also report a projected e2e from the two stages.
    reqs = make_requests(7)
    cand_rows = np.random.default_rng(3).integers(0, n, size=(b, 128))
    chunk_lists = [
        [engine.device_index.meta[int(r)] for r in cand_rows[qi]]
        for qi in range(b)
    ]
    queries = [(q, emb) for q, emb, _ in reqs]
    engine._exact_hits_multi(queries, chunk_lists, now)  # warm caches
    t0 = time.perf_counter()
    hits_lists = engine._exact_hits_multi(queries, chunk_lists, now)
    for hits in hits_lists:
        hits.sort(key=lambda h: -h.score)
    rescore_s = time.perf_counter() - t0
    rescore_qps = b / rescore_s
    return {
        "e2e_qps_tunnel": round(b * batches / elapsed, 1),
        "e2e_batch_ms_tunnel": round(elapsed / batches * 1000.0, 2),
        "e2e_escalations_last": engine.last_escalations,
        "host_rescore_qps": round(rescore_qps, 1),
    }


def main() -> None:
    n = int(os.environ.get("OMNI_BENCH_N", 1 << 20))  # ~1M, block-aligned
    d = int(os.environ.get("OMNI_BENCH_D", 768))
    b = int(os.environ.get("OMNI_BENCH_B", 448))  # ~8ms p50, safely under the 10ms target
    bits = int(os.environ.get("OMNI_BENCH_BITS", 1024))
    m = int(os.environ.get("OMNI_BENCH_M", 128))
    g = int(os.environ.get("OMNI_BENCH_G", 6))       # batches per megastep
    steps = int(os.environ.get("OMNI_BENCH_STEPS", 3))
    dtype = os.environ.get("OMNI_BENCH_DTYPE", "int8")  # int8 | bf16

    from omni_recall_tpu.ops import pallas_scorer, xla_scorer

    interpret = jax.default_backend() not in ("tpu",)
    if interpret:  # CPU smoke mode: keep it small
        n, b, g, steps = 4096, 8, 2, 2

    key = jax.random.PRNGKey(0)
    k_emb, k_bloom, k_q, k_w = jax.random.split(key, 4)

    # n <= 1M: generate on device (fast). Above that, generate slab-wise ON
    # HOST so the full f32 matrix never exists in HBM; NOTE the dev tunnel
    # transfers large host arrays at only ~10-50 MB/s, so multi-GB indexes
    # take many minutes to upload — the multi-million-row configs are
    # evidenced through the sharded per-chip math instead (docs/STATUS_R1.md)
    slab = min(n, 1 << 20)
    if dtype == "int8" and n <= (1 << 20):
        emb_f = jax.random.normal(k_emb, (n, d), dtype=jnp.float32)
        emb_f = emb_f / jnp.linalg.norm(emb_f, axis=1, keepdims=True)
        absmax = jnp.max(jnp.abs(emb_f), axis=1, keepdims=True)
        row_scale = (absmax / 127.0)[:, 0]
        emb = jnp.clip(jnp.round(emb_f / (absmax / 127.0)), -127, 127).astype(jnp.int8)
        row_err = jnp.linalg.norm(
            emb_f - emb.astype(jnp.float32) * row_scale[:, None], axis=1
        ) * 1.000001
        del emb_f
    elif dtype == "int8":
        import ml_dtypes  # noqa: F401

        from omni_recall_tpu.ops.quantize import quantize_rows_int8

        emb_h = np.empty((n, d), dtype=np.int8)
        scale_h = np.empty((n,), dtype=np.float32)
        err_h = np.empty((n,), dtype=np.float32)
        host_rng = np.random.default_rng(0)
        for s_i in range(0, n, slab):
            f = host_rng.standard_normal((min(slab, n - s_i), d), dtype=np.float32)
            f /= np.linalg.norm(f, axis=1, keepdims=True)
            q, scale, err = quantize_rows_int8(f)
            emb_h[s_i : s_i + f.shape[0]] = q
            scale_h[s_i : s_i + f.shape[0]] = scale
            err_h[s_i : s_i + f.shape[0]] = err
        emb = jnp.asarray(emb_h)
        row_scale = jnp.asarray(scale_h)
        row_err = jnp.asarray(err_h)
        del emb_h, scale_h, err_h
    else:
        import ml_dtypes

        emb_h = np.empty((n, d), dtype=ml_dtypes.bfloat16)
        host_rng = np.random.default_rng(0)
        for s_i in range(0, n, slab):
            f = host_rng.standard_normal((min(slab, n - s_i), d), dtype=np.float32)
            f /= np.linalg.norm(f, axis=1, keepdims=True)
            emb_h[s_i : s_i + f.shape[0]] = f.astype(ml_dtypes.bfloat16)
        emb = jnp.asarray(emb_h)
        row_scale = row_err = None
        del emb_h
    # bloom fill ~25% per bit (realistic signature density)
    bloom = (
        jax.random.bits(k_bloom, (n, bits // 8), dtype=jnp.uint8)
        & jax.random.bits(jax.random.fold_in(k_bloom, 1), (n, bits // 8), dtype=jnp.uint8)
    )
    created = jnp.linspace(0.0, 365.0, n, dtype=jnp.float32)
    valid = jnp.ones((n,), dtype=bool)
    add_row = pallas_scorer.make_add_row(created, valid, jnp.float32(365.0), jnp.int32(0))

    q_all = jax.random.normal(k_q, (g, b, d), dtype=jnp.float32)
    q_all = q_all / jnp.linalg.norm(q_all, axis=-1, keepdims=True)
    mask = jax.random.uniform(k_w, (g, b, bits)) < (40.0 / bits)
    kw_all = jnp.where(mask, 0.025, 0.0).astype(jnp.float32)
    kw_bias = jnp.zeros((b, 1), dtype=jnp.float32)

    t_block = 1
    sub = 512

    def scan_one(q, kw_w, emb, bloom, add_row, r_scale, interp):
        if dtype == "int8":
            q_absmax = jnp.max(jnp.abs(q), axis=1, keepdims=True)
            q_scale = q_absmax / 127.0
            q8 = jnp.clip(jnp.round(q / jnp.where(q_scale > 0, q_scale, 1.0)),
                          -127, 127).astype(jnp.int8)
            eq = jnp.linalg.norm(
                q - q8.astype(jnp.float32) * q_scale, axis=1, keepdims=True
            ) * 1.000001
            kw_w8 = jnp.clip(jnp.ceil(kw_w * 127.0), 0, 127).astype(jnp.int8)
            return pallas_scorer.block_topt_int8(
                emb, bloom, q8, kw_w8, kw_bias, add_row,
                r_scale[None, :], q_scale, 0.7 * eq,
                t=t_block, sub=sub, interpret=interp,
            )
        return pallas_scorer.block_topt(
            emb, bloom, q, kw_w, kw_bias, add_row, t=t_block, sub=sub,
            interpret=interp,
        )

    @functools.partial(jax.jit, static_argnames=("interp",))
    def megastep(carry, emb, bloom, add_row, r_scale, q_all, kw_all, interp):
        def body(c, inp):
            q, kw_w = inp
            q = q + 1e-12 * c[:, None]  # serialize: depend on previous batch
            bvals, bidxs = scan_one(q, kw_w, emb, bloom, add_row, r_scale, interp)
            bb, nb, t1 = bvals.shape
            cand_v = bvals[:, :, : t1 - 1].reshape(bb, -1)
            cand_i = bidxs[:, :, : t1 - 1].reshape(bb, -1)
            top_v, pos = jax.lax.top_k(cand_v, min(m, cand_v.shape[1]))
            top_i = jnp.take_along_axis(cand_i, pos, axis=1)
            new_c = top_v[:, 0] + top_i[:, 0].astype(jnp.float32) * 1e-9
            return new_c, (top_v[:, :4], top_i[:, :4])
        carry, outs = jax.lax.scan(body, carry, (q_all, kw_all))
        return carry, outs

    r_scale = row_scale if row_scale is not None else jnp.zeros((n,), jnp.float32)
    carry = jnp.zeros((b,), dtype=jnp.float32)
    carry, outs = megastep(carry, emb, bloom, add_row, r_scale, q_all, kw_all, interpret)
    _ = np.asarray(carry[:2])  # compile + settle

    start = time.perf_counter()
    c = carry
    for i in range(steps):
        c, outs = megastep(c, emb, bloom, add_row, r_scale, q_all, kw_all, interpret)
    _ = np.asarray(c[:2])  # force completion
    elapsed = time.perf_counter() - start

    scans = g * steps
    per_scan = elapsed / scans
    qps = b * scans / elapsed

    details = {
        "n_chunks": n, "dim": d, "batch": b, "bloom_bits": bits,
        "top_m": m, "dtype": dtype, "scan_ms": round(per_scan * 1000.0, 3),
        "p50_batch_latency_ms": round(per_scan * 1000.0, 3),
        "backend": jax.default_backend(),
    }
    if os.environ.get("OMNI_BENCH_E2E", "1") == "1" and not interpret:
        del emb, bloom, add_row  # free HBM before the e2e engine builds
        # smaller corpus for the e2e stage: it validates the full engine
        # path (scan + certificate + host rescore), not the scan rate
        details.update(bench_e2e(min(n, 1 << 18), d, min(b, 128), bits, batches=3))
        # projected production e2e: device scan + host rescore pipelined
        if "host_rescore_qps" in details:
            r = details["host_rescore_qps"]
            details["e2e_qps_projected"] = round(1.0 / (1.0 / qps + 1.0 / r), 1)

    result = {
        "metric": "hybrid_search_device_scan_qps_1m_chunks",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / 100_000.0, 4),
        "details": details,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
