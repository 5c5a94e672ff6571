"""Top-k-with-payload for TPU: one stable co-sort instead of top_k + gather.

XLA's TPU lowering of ``take_along_axis`` on a [B, n] minor-dim gather is
slow (~2.8 ms for B=1536, n=1024, k=128 — measured on v5e, see
docs/STATUS_R2.md), while a single stable ``lax.sort`` carrying the payload
costs ~0.8 ms. ``lax.top_k`` itself lowers to a sort anyway, so co-sorting
the payload in the same call removes the gather for free.

Tie semantics match ``lax.top_k``: the sort is stable, so equal values keep
their original (ascending-position) order — the engine's deterministic
lowest-row-index-wins contract.
"""

from __future__ import annotations

import jax


def top_k_with_payload(vals: jax.Array, payload: jax.Array, k: int):
    """Descending top-k of ``vals`` along the last axis with the aligned
    ``payload`` rows co-sorted. Returns (top_vals, top_payload), each
    ``vals.shape[:-1] + (k,)``."""
    neg, pay = jax.lax.sort(
        (-vals, payload), dimension=vals.ndim - 1, num_keys=1
    )
    return -neg[..., :k], pay[..., :k]
