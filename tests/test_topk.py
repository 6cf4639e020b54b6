"""topk_bisect + topk_chunked (ops/topk.py) vs lax.top_k: exact values,
valid index sets, robust to heavy ties (zero-padded canvases make thousands
of identical RPN scores) and to -inf masking. topk_chunked is the function
wired into the production RPN proposal path (rpn.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detectron_tpu.ops.topk import topk_bisect, topk_chunked


def _check(scores, k):
    vals, idx = jax.jit(lambda s: topk_bisect(s, k))(jnp.asarray(scores))
    vals, idx = np.asarray(vals), np.asarray(idx)
    ref_vals = -np.sort(-scores, axis=-1)[..., :k]
    np.testing.assert_array_equal(vals, ref_vals.astype(np.float32))
    # indices must point at the claimed values and be unique per row
    flat_s = scores.reshape(-1, scores.shape[-1])
    flat_v = vals.reshape(-1, k)
    flat_i = idx.reshape(-1, k)
    for r in range(flat_s.shape[0]):
        np.testing.assert_array_equal(flat_s[r][flat_i[r]], flat_v[r])
        assert len(set(flat_i[r].tolist())) == k
    return vals, idx


def test_random_large():
    rng = np.random.RandomState(0)
    s = rng.randn(3, 50000).astype(np.float32)
    _check(s, 1000)


def test_heavy_ties_padded_canvas():
    # mimic a padded canvas: most scores are one identical constant that
    # straddles the k-th position
    rng = np.random.RandomState(1)
    s = np.full((2, 30000), -2.5, np.float32)
    s[:, :500] = rng.randn(2, 500).astype(np.float32) + 5.0  # clear winners
    vals, idx = _check(s, 1000)
    # ties must be broken lowest-index-first (stable like np.argsort)
    tie_idx = np.sort(idx[0][vals[0] == -2.5])
    assert tie_idx[0] >= 500
    np.testing.assert_array_equal(tie_idx, np.sort(tie_idx))


def test_all_equal():
    s = np.zeros((1, 20000), np.float32)
    vals, idx = _check(s, 128)
    np.testing.assert_array_equal(np.sort(idx[0]), np.arange(128))


def test_neg_inf_masking():
    rng = np.random.RandomState(2)
    s = rng.randn(1, 20000).astype(np.float32)
    s[0, 100:] = -np.inf  # fewer finite than k
    vals, _ = _check(s, 512)
    assert np.isfinite(vals[0][:100]).all()
    assert np.isneginf(vals[0][100:]).all()


def test_extreme_values_and_negatives():
    rng = np.random.RandomState(3)
    s = (rng.randn(2, 40000) * 1e20).astype(np.float32)
    s[0, ::7] = -s[0, ::7]
    _check(s, 777)


def test_small_n_falls_back():
    rng = np.random.RandomState(4)
    s = rng.randn(4, 256).astype(np.float32)
    vals, idx = topk_bisect(jnp.asarray(s), 16)
    ref_v, ref_i = jax.lax.top_k(jnp.asarray(s), 16)
    np.testing.assert_array_equal(np.asarray(vals), np.asarray(ref_v))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_i))


def test_matches_lax_topk_order_no_ties():
    # with distinct scores the full (value, index) sequence must equal
    # lax.top_k exactly
    rng = np.random.RandomState(5)
    s = rng.permutation(np.arange(30000, dtype=np.float32))[None] / 7.0
    vals, idx = topk_bisect(jnp.asarray(s), 1000)
    ref_v, ref_i = jax.lax.top_k(jnp.asarray(s), 1000)
    np.testing.assert_array_equal(np.asarray(vals), np.asarray(ref_v))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_i))


# ---------------------------------------------------------------------------
# topk_chunked — the production path (rpn.py RPN preselect)
# ---------------------------------------------------------------------------

def _check_chunked(scores, k, exact_order=False):
    """Values must equal lax.top_k bit-exactly; indices must be in-range,
    unique, and point at the claimed values."""
    s = jnp.asarray(scores)
    vals, idx = jax.jit(lambda x: topk_chunked(x, k))(s)
    ref_v, ref_i = jax.jit(lambda x: jax.lax.top_k(x, k))(s)
    vals, idx = np.asarray(vals), np.asarray(idx)
    ref_v = np.asarray(ref_v)
    np.testing.assert_array_equal(vals, ref_v)
    n = scores.shape[-1]
    assert idx.min() >= 0 and idx.max() < n
    flat_s = scores.reshape(-1, n)
    flat_v = vals.reshape(-1, k)
    flat_i = idx.reshape(-1, k)
    for r in range(flat_s.shape[0]):
        np.testing.assert_array_equal(flat_s[r][flat_i[r]], flat_v[r])
        assert len(set(flat_i[r].tolist())) == k
    if exact_order:
        np.testing.assert_array_equal(idx, np.asarray(ref_i))
    return vals, idx


def test_chunked_random_large():
    rng = np.random.RandomState(10)
    s = rng.randn(3, 50000).astype(np.float32)
    _check_chunked(s, 1000)


def test_chunked_matches_lax_topk_exactly_distinct():
    # distinct values: full (value, index) sequence == lax.top_k
    rng = np.random.RandomState(11)
    s = rng.permutation(np.arange(30000, dtype=np.float32))[None] / 7.0
    _check_chunked(s, 1000, exact_order=True)


def test_chunked_p2_shape():
    # the real workload: P2 score map ~209k scores, k=1000
    rng = np.random.RandomState(12)
    s = rng.randn(2, 208896).astype(np.float32)
    _check_chunked(s, 1000)


def test_chunked_heavy_ties_padded_canvas():
    # >k copies of one value straddling the k-th slot, concentrated early
    # (the padded-canvas pattern). Values must still be exact; the index
    # SET may legitimately differ from lax.top_k's (documented).
    rng = np.random.RandomState(13)
    s = np.full((2, 30000), -2.5, np.float32)
    s[:, :500] = rng.randn(2, 500).astype(np.float32) + 5.0
    vals, idx = _check_chunked(s, 1000)
    assert (vals[:, 500:] == -2.5).all()


def test_chunked_ties_concentrated_one_chunk():
    # all ties in ONE chunk (the advisor's case): n=40000 -> chunk ~6325,
    # put 3000 tied values inside [0, 5000)
    s = np.full((1, 40000), -10.0, np.float32)
    s[0, 1000:4000] = 7.0  # 3000 ties, one chunk, > kk of them
    s[0, :100] = 9.0
    vals, idx = _check_chunked(s, 2000)
    assert (vals[0, :100] == 9.0).all()
    assert (vals[0, 100:] == 7.0).all()


def test_chunked_neg_inf_masking_pad_indices_in_range():
    # fewer finite values than k, plus implicit -inf pad in the last chunk:
    # indices must stay < n (the clamp), values exact
    rng = np.random.RandomState(14)
    s = np.full((2, 30001), -np.inf, np.float32)  # odd n -> pad > 0
    s[:, 50:150] = rng.randn(2, 100).astype(np.float32)
    vals, idx = _check_chunked_neg_inf(s, 512)


def _check_chunked_neg_inf(scores, k):
    s = jnp.asarray(scores)
    vals, idx = jax.jit(lambda x: topk_chunked(x, k))(s)
    ref_v, _ = jax.lax.top_k(s, k)
    vals, idx = np.asarray(vals), np.asarray(idx)
    np.testing.assert_array_equal(vals, np.asarray(ref_v))
    n = scores.shape[-1]
    assert idx.min() >= 0 and idx.max() < n
    # finite slots must point at the right elements
    for r in range(scores.shape[0]):
        fin = np.isfinite(vals[r])
        np.testing.assert_array_equal(scores[r][idx[r][fin]], vals[r][fin])
    return vals, idx


def test_chunked_small_n_falls_back():
    rng = np.random.RandomState(15)
    s = rng.randn(4, 256).astype(np.float32)
    vals, idx = topk_chunked(jnp.asarray(s), 64)
    ref_v, ref_i = jax.lax.top_k(jnp.asarray(s), 64)
    np.testing.assert_array_equal(np.asarray(vals), np.asarray(ref_v))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_i))


def test_chunked_k_ge_n():
    rng = np.random.RandomState(16)
    s = rng.randn(2, 100).astype(np.float32)
    vals, idx = topk_chunked(jnp.asarray(s), 100)
    ref_v, _ = jax.lax.top_k(jnp.asarray(s), 100)
    np.testing.assert_array_equal(np.asarray(vals), np.asarray(ref_v))
