"""Probe: where do rebuild_index's 10.6 s at 65k rows go?

Times each stage separately: store fetch + sort, shadow append (signatures +
normalize + mirrors), and the device_arrays upload/quantize, with TWO upload
trials (the dev tunnel's transfer rate varies 0.4s..10s for the same bytes).

Run on the real chip: PYTHONPATH=.:$PYTHONPATH python tools/probe_rebuild.py
"""

from __future__ import annotations

import contextlib
import ctypes
import time

with contextlib.suppress(Exception):
    ctypes.CDLL(None).prctl(41, 1, 0, 0, 0)  # PR_SET_THP_DISABLE

import numpy as np

from datetime import timedelta

from omni_recall_tpu.config import EngineOptions
from omni_recall_tpu.index.device_index import EPOCH, DeviceIndex
from omni_recall_tpu.index.records import ChunkRecord, DocumentRecord
from omni_recall_tpu.index.store import InMemoryIngestionStore
from omni_recall_tpu.search.engine import RecallEngine


def main() -> None:
    n, d, bits = 1 << 16, 768, 1024
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((n, d), dtype=np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    now = EPOCH + timedelta(days=365.0)
    chunks = [
        ChunkRecord(
            id=f"rb:{i}", document_id="rb", chunk_index=i,
            content=f"topic c{i % 4096}x synthetic chunk",
            embedding=emb[i], created_at_utc=now, seq=i,
        )
        for i in range(n)
    ]
    store = InMemoryIngestionStore()
    store.upsert_document(DocumentRecord(id="rb", file_name="rb.txt"))
    store.upsert_chunks(chunks)

    opts = EngineOptions(
        backend="pallas", embedding_dim=d, recent_window=0,
        candidate_m=128, bloom_bits=bits, scan_dtype="int8",
        capacity_block=8192,
    )
    engine = RecallEngine(store, options=opts)

    t0 = time.perf_counter()
    fetched: list[ChunkRecord] = []
    for doc in store.list_documents(2**31 - 1):
        fetched.extend(store.get_chunks_by_document_id(doc.id))
    fetched.sort(key=lambda c: c.seq)
    t_fetch = time.perf_counter() - t0
    print(f"store fetch + sort        {t_fetch:8.3f} s  ({n / t_fetch:,.0f}/s)")

    old = engine.device_index
    t0 = time.perf_counter()
    shadow = DeviceIndex(
        old.dim, capacity_block=opts.capacity_block,
        bloom_bits=old.bloom_bits, ngram=old.ngram,
        bloom_hashes=old.bloom_hashes, mesh=old.mesh,
        scan_dtype=old.scan_dtype, refine=old.refine,
    )
    shadow.append(fetched)
    t_append = time.perf_counter() - t0
    print(f"shadow append             {t_append:8.3f} s  ({n / t_append:,.0f}/s)")

    for trial in range(2):
        sh2 = DeviceIndex(
            old.dim, capacity_block=opts.capacity_block,
            bloom_bits=old.bloom_bits, ngram=old.ngram,
            bloom_hashes=old.bloom_hashes, mesh=old.mesh,
            scan_dtype=old.scan_dtype, refine=old.refine,
        )
        sh2.append(fetched)
        t0 = time.perf_counter()
        sh2.device_arrays()
        t_up = time.perf_counter() - t0
        print(f"upload+quantize trial {trial}   {t_up:8.3f} s  ({n / t_up:,.0f}/s)")

    t0 = time.perf_counter()
    engine.rebuild_index()
    t_all = time.perf_counter() - t0
    print(f"rebuild_index (derive)    {t_all:8.3f} s  ({n / t_all:,.0f}/s)")

    # second rebuild: the store records are now the same objects the index
    # holds -> every row takes the append_from_index compaction fast path
    engine.device_index.device_arrays()
    t0 = time.perf_counter()
    engine.rebuild_index()
    t_all = time.perf_counter() - t0
    print(f"rebuild_index (compact)   {t_all:8.3f} s  ({n / t_all:,.0f}/s)")


if __name__ == "__main__":
    main()
