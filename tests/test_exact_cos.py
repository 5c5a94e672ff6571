"""Device-exact cosine (ops/exact_cos.py): double-float dot vs the f64 oracle.

The DD stage replaces the host rescore's embedding stream, so its output
plus margin MUST bracket the numpy-oracle cosine for every pair — including
cancellation-heavy adversarial vectors, zero norms, and empty slots. The
margin must also be tight enough that certificates essentially always pass
(escalation is correct but slow)."""

import numpy as np
import pytest

import jax.numpy as jnp

from omni_recall_tpu.ops import exact_cos


def np_pairwise_dot(q: np.ndarray, c: np.ndarray) -> np.ndarray:
    """The oracle's summation: f32 products, f64 pairwise accumulation
    (bit-identical to engine._exact_rescore_rows' numpy branch)."""
    return np.sum((q * c), axis=-1, dtype=np.float64)


@pytest.mark.parametrize("d", [768, 640, 1536, 64, 1])
def test_dd_dot_brackets_numpy(d):
    rng = np.random.default_rng(0)
    b, t = 8, 16
    q = rng.standard_normal((b, d)).astype(np.float32)
    raw = rng.standard_normal((64, d)).astype(np.float32)
    rows = rng.integers(0, 64, size=(b, t)).astype(np.int32)

    hi, lo, sabs = map(
        np.asarray, exact_cos.exact_cos_rows(jnp.asarray(raw), jnp.asarray(rows), jnp.asarray(q))
    )
    dd = hi.astype(np.float64) + lo.astype(np.float64)

    prods = q[:, None, :] * raw[rows]  # f32 products, the shared definition
    ref = np.sum(prods, axis=-1, dtype=np.float64)
    true_abs = np.sum(np.abs(prods), axis=-1, dtype=np.float64)

    bound = (exact_cos.DD_SUM_REL + exact_cos.NP_SUM_REL) * (
        sabs.astype(np.float64) * (1.0 + exact_cos.SABS_REL)
    )
    assert (np.abs(dd - ref) <= bound).all()
    # sabs must upper-bound the true sum|p| after its inflation
    assert (
        sabs.astype(np.float64) * (1.0 + exact_cos.SABS_REL) >= true_abs * (1 - 1e-12)
    ).all()
    # and the DD value itself is far tighter than the claimed margin
    assert np.abs(dd - ref).max() <= 1e-10 * max(1.0, true_abs.max())


def test_dd_dot_cancellation_adversarial():
    """Huge positive/negative products cancelling to a tiny sum: the naive
    f32 sum is garbage; DD + margin must still bracket the f64 result."""
    rng = np.random.default_rng(1)
    d = 768
    q = np.empty((4, d), dtype=np.float32)
    raw = np.empty((4, d), dtype=np.float32)
    for i in range(4):
        big = rng.uniform(1e3, 1e4, size=d // 2).astype(np.float32)
        q[i, : d // 2] = big
        q[i, d // 2 :] = big
        raw[i, : d // 2] = 1.0
        raw[i, d // 2 :] = -1.0
        # perturb one lane so the true sum is small but nonzero
        raw[i, 0] += np.float32(1e-3) * rng.standard_normal()
    rows = np.arange(4, dtype=np.int32).reshape(4, 1)

    hi, lo, sabs = map(
        np.asarray,
        exact_cos.exact_cos_rows(jnp.asarray(raw), jnp.asarray(rows), jnp.asarray(q)),
    )
    dd = hi.astype(np.float64) + lo.astype(np.float64)
    prods = q[:, None, :] * raw[rows]
    ref = np.sum(prods, axis=-1, dtype=np.float64)
    bound = (exact_cos.DD_SUM_REL + exact_cos.NP_SUM_REL) * (
        sabs.astype(np.float64) * (1.0 + exact_cos.SABS_REL)
    )
    assert (np.abs(dd - ref) <= bound).all()
    # the naive f32 sum would be off by orders of magnitude more than DD is
    naive = prods.astype(np.float32).sum(axis=-1, dtype=np.float32)
    assert np.abs(dd - ref).max() < np.abs(naive.astype(np.float64) - ref).max()


def test_finish_cosines_zero_norm_guards():
    hi = np.array([0.5, 0.5, 0.0], dtype=np.float32)
    lo = np.zeros(3, dtype=np.float32)
    sabs = np.array([1.0, 1.0, 0.0], dtype=np.float32)
    qn = np.array([1.0, 0.0, 1.0])
    ns = np.array([4.0, 1.0, 0.0])
    cos, margin = exact_cos.finish_cosines(hi, lo, sabs, qn, ns)
    assert cos[0] == pytest.approx(0.25)
    assert margin[0] > 0.0
    # zero norms: the oracle forces cosine 0 — ours must be 0 with margin 0
    # (an exact value, so equal-score ties certify through to tie-breaks)
    assert cos[1] == 0.0 and margin[1] == 0.0
    assert cos[2] == 0.0 and margin[2] == 0.0


def test_finish_cosines_matches_oracle_division():
    rng = np.random.default_rng(2)
    d = 768
    q = rng.standard_normal((16, d)).astype(np.float32)
    raw = rng.standard_normal((16, d)).astype(np.float32)
    rows = np.arange(16, dtype=np.int32).reshape(16, 1)
    hi, lo, sabs = map(
        np.asarray,
        exact_cos.exact_cos_rows(jnp.asarray(raw), jnp.asarray(rows), jnp.asarray(q)),
    )
    qn = np.sum((q * q), axis=1, dtype=np.float64)
    ns = np.sum((raw * raw), axis=1, dtype=np.float64)
    cos, margin = exact_cos.finish_cosines(
        hi[:, 0], lo[:, 0], sabs[:, 0], qn, ns
    )
    ref = np_pairwise_dot(q, raw) / (np.sqrt(qn) * np.sqrt(ns))
    assert (np.abs(cos - ref) <= margin).all()
    assert np.abs(cos - ref).max() < 1e-12


def test_round4_certified():
    s = np.array([0.123449, 0.12345, 0.5, 0.49995])
    m = np.array([1e-9, 1e-9, 1e-3, 1e-9])
    ok = exact_cos.round4_certified(s, m)
    assert ok[0]  # far from the midpoint at this margin
    assert not ok[2]  # 1e-3 margin spans many rounding cells
    # exactly-on-midpoint values with tiny margins may or may not certify
    # depending on binary representation — either answer is sound; just
    # check the function is monotone in the margin
    assert exact_cos.round4_certified(s, np.zeros(4)).all()
