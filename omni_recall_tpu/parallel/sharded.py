"""Multi-chip sharded scoring: per-shard top-k + all-gather merge.

The chunk index rows shard over a 1-D ``'shards'`` mesh. Each shard scores
its local rows (same upper-bound math as ops/xla_scorer.py, with global row
ids for the recency-window mask), takes a LOCAL top-(m+1), and the small
[S, B, m+1] candidate tensors are all-gathered over ICI and merged into the
global top-(m+1) — exact because scoring is pointwise per row, so the global
top-k is contained in the union of per-shard top-k's, and the merged boundary
(max excluded upper bound) is exactly entry m of the merged list. Determinism:
ties inside a shard resolve to the lowest local row (lax.top_k), and the merge
re-sorts on (value, then gather order), so the candidate SET is deterministic;
final ranking order is decided by the host's exact rescore, which is
shard-count independent (tested in tests/test_sharded.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from omni_recall_tpu.ops import xla_scorer


class ShardedScorer:
    """Caches jitted shard_map scorers per (mesh, m)."""

    def __init__(self, mesh: Mesh) -> None:
        self.mesh = mesh
        self.n_shards = mesh.devices.size
        self._fns: dict[int, object] = {}

    def row_sharding(self, ndim: int) -> NamedSharding:
        return NamedSharding(self.mesh, P("shards", *([None] * (ndim - 1))))

    def _build(self, m: int):
        mesh = self.mesh
        k_local = m + 1

        def local_fn(emb, bloom, created, valid, q, kw_w, kw_b, now_days, window_start):
            n_local = emb.shape[0]
            shard = jax.lax.axis_index("shards")
            row_offset = (shard * n_local).astype(jnp.int32)
            ub = xla_scorer.ub_scores(
                emb, bloom, created, valid, q, kw_w, kw_b,
                now_days, window_start, row_offset=row_offset,
            )
            k = min(k_local, n_local)
            vals, idxs = xla_scorer._topk_rows(ub, k)
            if k < k_local:  # pad so the gather shape is uniform
                pad = k_local - k
                vals = jnp.pad(vals, ((0, 0), (0, pad)), constant_values=-jnp.inf)
                idxs = jnp.pad(idxs, ((0, 0), (0, pad)))
            gidxs = idxs + row_offset
            # [S, B, m+1] on every shard
            all_vals = jax.lax.all_gather(vals, "shards")
            all_idxs = jax.lax.all_gather(gidxs, "shards")
            b = all_vals.shape[1]
            flat_vals = jnp.transpose(all_vals, (1, 0, 2)).reshape(b, -1)
            flat_idxs = jnp.transpose(all_idxs, (1, 0, 2)).reshape(b, -1)
            top_v, pos = jax.lax.top_k(flat_vals, k_local)
            top_i = jnp.take_along_axis(flat_idxs, pos, axis=1)
            return top_v, top_i

        row = P("shards", None)
        vec = P("shards")
        rep = P()
        fn = jax.jit(
            jax.shard_map(
                local_fn,
                mesh=mesh,
                in_specs=(row, row, vec, vec, rep, rep, rep, rep, rep),
                out_specs=(rep, rep),
                check_vma=False,
            )
        )
        return fn

    def score_topm(self, emb, bloom, created, valid, q, kw_w, kw_b, now_days, window_start, m: int):
        fn = self._fns.get(m)
        if fn is None:
            fn = self._fns[m] = self._build(m)
        return fn(emb, bloom, created, valid, q, kw_w, kw_b, now_days, window_start)
