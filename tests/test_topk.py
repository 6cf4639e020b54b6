"""topk_bisect (ops/topk.py) vs lax.top_k: exact values, valid index sets,
robust to heavy ties (zero-padded canvases make thousands of identical RPN
scores) and to -inf masking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detectron_tpu.ops.topk import topk_bisect


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
