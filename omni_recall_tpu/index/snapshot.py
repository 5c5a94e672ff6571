"""Index snapshot / restore.

The reference delegates durability to Cosmos/Blob and loses the in-memory
store on restart (SURVEY.md §5 "checkpoint/resume — none in-app"). The TPU
rebuild makes persistence first-class: a snapshot directory holds

- ``snapshot.npz`` — ONE atomically-renamed archive holding the JSON
  metadata (documents + chunk ids/content/timestamps/insertion seq) and all
  chunk embeddings as a flat f64 array plus offsets (ragged-safe: chunks
  may have missing or odd-dimension vectors). f64 keeps the oracle/host
  paths' float64 scoring bit-identical across a restore; the single file
  makes a crash mid-save unable to desynchronize meta from embeddings.
  (The legacy meta.json + embeddings.npz layout is still loadable.)

``load_snapshot`` rebuilds the host store with identical seq ordering, so a
restored device index reproduces bit-identical rankings (rows are appended
in (created_at, seq) order). Raw blobs are the raw-document store's concern
(LocalFileRawDocumentStore already persists to disk)."""

from __future__ import annotations

import contextlib
import json
import os
from datetime import datetime
from pathlib import Path

import numpy as np

from omni_recall_tpu.contracts import iso_utc
from omni_recall_tpu.index.records import ChunkRecord, DocumentRecord
from omni_recall_tpu.index.store import InMemoryIngestionStore

FORMAT_VERSION = 1


def _parse_dt(value: str | None) -> datetime | None:
    if not value:
        return None
    return datetime.fromisoformat(value.replace("Z", "+00:00"))


def save_snapshot(store: InMemoryIngestionStore, path: str | Path) -> None:
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)

    # one consistent read: the store's lock (when present) makes the
    # documents and their chunk lists a single atomic view — without it a
    # concurrent delete between list_documents and get_chunks leaves a
    # ghost document with chunkCount > 0 but no chunks in the snapshot
    lock = getattr(store, "_lock", None) or contextlib.nullcontext()
    with lock:
        documents = store.list_documents(2**31 - 1)
        chunks: list[ChunkRecord] = []
        for doc in documents:
            chunks.extend(store.get_chunks_by_document_id(doc.id))
    chunks.sort(key=lambda c: c.seq)

    flat: list[np.ndarray] = []
    offsets = np.zeros(len(chunks) + 1, dtype=np.int64)
    for i, chunk in enumerate(chunks):
        # f64: the oracle/host-scan paths score the RAW embedding values in
        # float64, so an f32 round-trip would shift post-restore scores in
        # the low bits (near-ties could swap rank across a restart)
        vec = np.asarray(chunk.embedding or [], dtype=np.float64)
        flat.append(vec)
        offsets[i + 1] = offsets[i] + vec.size
    emb_flat = np.concatenate(flat) if flat else np.zeros(0, dtype=np.float64)
    has_emb = np.array([c.embedding is not None for c in chunks], dtype=bool)

    emb_arrays = {"emb_flat": emb_flat, "offsets": offsets, "has_emb": has_emb}
    meta = {
        "version": FORMAT_VERSION,
        "documents": [
            {
                "id": d.id, "fileName": d.file_name, "sourceType": d.source_type,
                "blobPath": d.blob_path, "contentHash": d.content_hash,
                "chunkCount": d.chunk_count,
                "createdAtUtc": iso_utc(d.created_at_utc) if d.created_at_utc else None,
            }
            for d in documents
        ],
        "chunks": [
            {
                "id": c.id, "documentId": c.document_id, "chunkIndex": c.chunk_index,
                "content": c.content, "seq": c.seq,
                "createdAtUtc": iso_utc(c.created_at_utc) if c.created_at_utc else None,
            }
            for c in chunks
        ],
    }
    # ONE archive + ONE atomic rename: meta and embeddings can never
    # desynchronize, and a crash mid-save leaves the previous good
    # snapshot untouched (the old two-file layout could pair a new npz
    # with an old meta.json whose offsets index a different chunk list)
    tmp = path / f".snapshot.{os.getpid()}.tmp.npz"
    np.savez_compressed(
        tmp,
        meta_json=np.frombuffer(
            json.dumps(meta).encode("utf-8"), dtype=np.uint8
        ),
        **emb_arrays,
    )
    os.replace(tmp, path / "snapshot.npz")
    # clean up a legacy two-file snapshot so stale halves can't be loaded
    for legacy in ("meta.json", "embeddings.npz"):
        with contextlib.suppress(OSError):
            (path / legacy).unlink()


def load_snapshot(path: str | Path) -> InMemoryIngestionStore:
    path = Path(path)
    bundle = path / "snapshot.npz"
    # context-manage the NpzFile: np.load keeps the underlying file handle
    # open for the process lifetime otherwise (a later save_snapshot's
    # os.replace works on Linux but the stale handle would linger)
    if bundle.is_file():
        with np.load(bundle) as arrays:
            meta = json.loads(bytes(arrays["meta_json"].tobytes()).decode("utf-8"))
            emb_flat, offsets, has_emb = (
                arrays["emb_flat"], arrays["offsets"], arrays["has_emb"]
            )
    else:  # legacy two-file layout (pre-atomic-save snapshots)
        meta = json.loads((path / "meta.json").read_text(encoding="utf-8"))
        with np.load(path / "embeddings.npz") as arrays:
            emb_flat, offsets, has_emb = (
                arrays["emb_flat"], arrays["offsets"], arrays["has_emb"]
            )
    if meta.get("version") != FORMAT_VERSION:
        raise ValueError(f"Unsupported snapshot version: {meta.get('version')}")

    store = InMemoryIngestionStore()
    for d in meta["documents"]:
        store.upsert_document(
            DocumentRecord(
                id=d["id"], file_name=d["fileName"], source_type=d["sourceType"],
                blob_path=d["blobPath"], content_hash=d["contentHash"],
                chunk_count=d["chunkCount"], created_at_utc=_parse_dt(d["createdAtUtc"]),
            )
        )
    chunks: list[ChunkRecord] = []
    for i, c in enumerate(meta["chunks"]):
        vec = emb_flat[offsets[i] : offsets[i + 1]]
        chunks.append(
            ChunkRecord(
                id=c["id"], document_id=c["documentId"], chunk_index=c["chunkIndex"],
                content=c["content"],
                embedding=vec.tolist() if bool(has_emb[i]) else None,
                created_at_utc=_parse_dt(c["createdAtUtc"]),
                seq=c["seq"],
            )
        )
    store.upsert_chunks(chunks)  # seq preserved: records carry their seq
    store._seq = max((c.seq for c in chunks), default=-1) + 1
    return store


def restore_engine(store: InMemoryIngestionStore, engine) -> None:
    """Rebuild the device index from a restored store, preserving row order."""
    chunks: list[ChunkRecord] = []
    for doc in store.list_documents(2**31 - 1):
        chunks.extend(store.get_chunks_by_document_id(doc.id))
    chunks.sort(key=lambda c: c.seq)
    engine.on_chunks_upserted(chunks, new=True)
