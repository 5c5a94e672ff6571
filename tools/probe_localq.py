"""Probe: where the localq (device-resident-query) serving batch goes.

BENCH_r03-in-progress measured e2e_qps_tunnel_localq ~= 941 at
(lq_n=64k, bt=1536) — 1.63 s/batch — while the stage's transport is tiny
(token ids + sparse keyword weights up, ~1 MB of compact candidates back)
and the device work at 64k rows is ~2 ms. This probe reproduces the bench
stage via bench.build_localq_engine, instruments the host-side helpers with
accumulating timers, and splits dispatch vs finalize per batch so the
optimization targets the real hotspot.

Run on the real chip:
  cd /root/repo && PYTHONPATH=.:/root/.axon_site python -u tools/probe_localq.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TIMES: dict[str, float] = {}
COUNTS: dict[str, int] = {}


def wrap(obj, name, key=None):
    fn = getattr(obj, name)
    key = key or name

    @functools.wraps(fn)
    def w(*a, **k):
        t0 = time.perf_counter()
        try:
            return fn(*a, **k)
        finally:
            dt = time.perf_counter() - t0
            TIMES[key] = TIMES.get(key, 0.0) + dt
            COUNTS[key] = COUNTS.get(key, 0) + 1

    setattr(obj, name, w)
    return fn


def dump(label):
    print(f"\naccumulated ({label}):", flush=True)
    for k in sorted(TIMES, key=lambda k: -TIMES[k]):
        print(f"  {k:30s} {TIMES[k] * 1e3:9.1f} ms  x{COUNTS[k]}")
    TIMES.clear()
    COUNTS.clear()


def main() -> None:
    import bench
    from omni_recall_tpu.config import EngineOptions

    n = int(os.environ.get("OMNI_BENCH_LOCALQ_N", 1 << 16))
    d, bits, bt = 768, 1024, int(os.environ.get("OMNI_BENCH_BT", 1536))
    g = int(os.environ.get("OMNI_BENCH_PIPE_G", 6))
    opts = EngineOptions(
        backend="pallas", embedding_dim=d, recent_window=0,
        candidate_m=128, bloom_bits=bits, scan_dtype="int8",
        capacity_block=max(8192, n // 64), device_exact_cos=True,
    )
    t0 = time.perf_counter()
    engine, make_reqs, lq_n = bench.build_localq_engine(n, d, bits, opts)
    print(f"setup {time.perf_counter() - t0:.1f} s (lq_n={lq_n})", flush=True)

    from datetime import timedelta

    from omni_recall_tpu.index.device_index import EPOCH

    now = EPOCH + timedelta(days=365.0)

    t0 = time.perf_counter()
    engine.search_batches_pipelined([make_reqs(60, bt)], now=now)
    print(f"warmup1 {time.perf_counter() - t0:.1f} s", flush=True)
    t0 = time.perf_counter()
    engine.search_batches_pipelined([make_reqs(61, bt)], now=now)
    print(f"warmup2 {time.perf_counter() - t0:.1f} s", flush=True)

    from omni_recall_tpu.ops import exact_cos, hashing, native
    from omni_recall_tpu.search import engine as engine_mod

    wrap(engine, "_exact_rescore_rows")
    wrap(engine, "_kw_scores_flat")
    wrap(engine, "_search_full_host")
    wrap(engine_mod, "_dd_certify_batch")
    wrap(exact_cos, "finish_cosines")
    wrap(jax, "device_get")
    wrap(engine._device_embedder, "embed_device")
    wrap(hashing, "query_bit_weights_batch")
    wrap(native, "hybrid_rescore")
    wrap(engine, "_sparse_w_dev")

    prof = None
    if os.environ.get("OMNI_PROBE_PROFILE", "0") == "1":
        import cProfile

        prof = cProfile.Profile()
        prof.enable()
    for i in range(3):
        reqs = make_reqs(300 + i, bt)
        t0 = time.perf_counter()
        ctx = engine._dispatch_device_batch(reqs, 0, now)
        t1 = time.perf_counter()
        engine._finalize_device_batch(ctx)
        t2 = time.perf_counter()
        print(
            f"batch {i}: dispatch {1e3 * (t1 - t0):7.1f} ms   "
            f"finalize {1e3 * (t2 - t1):7.1f} ms", flush=True,
        )
    if prof is not None:
        import pstats

        prof.disable()
        pstats.Stats(prof).sort_stats("cumulative").print_stats(35)
    dump("3 sequential batches")

    batches = [make_reqs(400 + i, bt) for i in range(g)]
    s0 = dict(engine.stats)
    prof = None
    if os.environ.get("OMNI_PROBE_PROFILE", "0") == "1":
        import cProfile

        prof = cProfile.Profile()
        prof.enable()
    t0 = time.perf_counter()
    engine.search_batches_pipelined(batches, now=now)
    el = time.perf_counter() - t0
    if prof is not None:
        import pstats

        prof.disable()
        pstats.Stats(prof).sort_stats("cumulative").print_stats(30)
    print(f"\npipelined: {g * bt / el:.0f} QPS  ({el / g * 1000:.1f} ms/batch)")
    for k in (
        "dd_resolved_total", "dd_escalations_total", "host_fallbacks_total",
        "escalation_rounds_total", "rescue_sliced_total",
        "coarse_resolved_total", "rescore_pairs_total",
    ):
        print(f"  {k}: {engine.stats[k] - s0.get(k, 0)}")
    dump("pipelined")


if __name__ == "__main__":
    main()
