"""Fast exact top-k for very long score vectors (RPN proposal preselection).

`lax.top_k(k=1000)` over a ~210k-element FPN P2 score map lowers to a
sort-bound XLA TopK on TPU (~10 ms per level-batch at batch 32 — see
PERF.md). The reference does the same selection with `np.argsort` on the
host (lib/modeling/generate_proposals.py :: GenerateProposalsOp), so any
exact selection matches its semantics (ties broken arbitrarily there too).

Algorithm (radix-select, no sort over n):
  1. Map f32 scores to their order-preserving uint32 view.
  2. Bisect the key space to find t* = the exact k-th largest key. Each
     round tests FANOUT thresholds inside the current interval with ONE
     fused compare+reduce pass over the data (VPU-bound); the interval
     shrinks (FANOUT+1)x per round, so 8 rounds of fanout 15 resolve all
     32 bits — t* is bit-exact, ties included.
  3. Compact the (< k) elements strictly above t*, then fill the remaining
     slots with the lowest-index elements equal to t* (cumsum + scatter —
     each one pass). This is safe under ANY tie mass (zero-padded canvas
     regions produce thousands of identical RPN scores).
  4. A tiny lax.top_k over the k-element buffer yields descending order.

Total: ~10 linear passes over the data instead of a full sort.

MEASURED OUTCOME (v5e, batch 32, n=210k, k=1000): radix-select 34 ms vs
7.8 ms for XLA's native TopK — the final cumsum+scatter compaction is
scatter-bound on TPU and dominates, so topk_bisect is kept as a tested,
documented negative result. The production proposal path uses
topk_chunked (below): explicit sqrt(n*k) two-stage chunking of exact
lax.top_k, which beats XLA's own TopK chunking (it merged 128k elements
for the P2 map; xprof sort.22/23).
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _order_preserving_uint32(x):
    """Monotonic bijection f32 -> uint32 (IEEE-754 total order trick)."""
    bits = lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    return jnp.where(bits >> 31 == 1, ~bits, bits | jnp.uint32(0x80000000))


@functools.partial(jax.jit, static_argnames=("k", "fanout"))
def topk_bisect(scores, k, fanout=15):
    """Exact top-k over the last axis of `scores` (any leading batch dims).

    Same contract as lax.top_k: returns (values (..., k) f32 descending,
    indices (..., k) int32). Tie-break among equal scores is lowest index
    first (np.argsort-stable, like the reference's host selection).
    """
    orig_shape = scores.shape
    n = orig_shape[-1]
    if n <= max(4 * k, 4096):
        vals, idx = lax.top_k(scores, k)
        return vals, idx.astype(jnp.int32)

    flat = scores.reshape((-1, n)).astype(jnp.float32)
    keys = _order_preserving_uint32(flat)  # (B, n)
    B = flat.shape[0]

    # Bisection invariant: count(keys >= lo) >= k, count(keys >= hi+1) < k.
    # Span recurrence: span' <= span//(fanout+1) + fanout (the last
    # sub-interval absorbs the division remainder), so a few extra rounds
    # past 32/log2(fanout+1) close the interval to a single key.
    import math
    rounds = math.ceil(32 / math.log2(fanout + 1)) + 3

    lo = jnp.zeros((B,), jnp.uint32)
    hi = jnp.full((B,), 0xFFFFFFFF, jnp.uint32)

    def round_fn(carry, _):
        lo, hi = carry
        span = hi - lo  # uint32, no overflow: hi >= lo
        step = jnp.maximum(span // jnp.uint32(fanout + 1), jnp.uint32(1))
        offs = jnp.arange(1, fanout + 1, dtype=jnp.uint32)
        # candidate thresholds, clamped into (lo, hi]
        ts = lo[:, None] + jnp.minimum(
            step[:, None] * offs[None, :], span[:, None])  # (B, fanout)
        counts = jnp.sum(
            (keys[:, None, :] >= ts[:, :, None]).astype(jnp.int32),
            axis=-1)  # (B, fanout) — one fused pass over the data
        ge_k = counts >= k  # non-increasing along the fanout axis
        new_lo = jnp.max(jnp.where(ge_k, ts, lo[:, None]), axis=1)
        new_hi = jnp.min(jnp.where(ge_k, hi[:, None], ts - 1), axis=1)
        return (jnp.maximum(new_lo, lo), jnp.minimum(new_hi, hi)), None

    (tstar, _), _ = lax.scan(round_fn, (lo, hi), None, length=rounds)
    # After full bisection lo == hi == t*, the exact k-th largest key.

    gt = keys > tstar[:, None]
    eq = keys == tstar[:, None]
    c_gt = jnp.sum(gt.astype(jnp.int32), axis=-1, keepdims=True)  # < k
    pos_gt = jnp.cumsum(gt.astype(jnp.int32), axis=-1) - 1
    pos_eq = c_gt + jnp.cumsum(eq.astype(jnp.int32), axis=-1) - 1
    pos = jnp.where(gt, pos_gt, jnp.where(eq, pos_eq, k))  # >=k drops

    buf_scores = jnp.full((B, k), -jnp.inf, jnp.float32)
    buf_idx = jnp.zeros((B, k), jnp.int32)
    bidx = jnp.arange(B)[:, None]
    buf_scores = buf_scores.at[bidx, pos].set(flat, mode="drop")
    buf_idx = buf_idx.at[bidx, pos].set(
        jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (B, n)),
        mode="drop")

    vals, sel = lax.top_k(buf_scores, k)  # tiny: k elements
    idx = jnp.take_along_axis(buf_idx, sel, axis=1)
    out_shape = orig_shape[:-1] + (k,)
    return vals.reshape(out_shape), idx.reshape(out_shape)


def topk_chunked(x, k, chunk_target=None):
    """Exact top-k over the last axis via explicit two-stage chunking.

    XLA's TopK rewriter picks chunk sizes poorly for large-k/large-n
    (e.g. k=1000 over the 209k-score FPN P2 map it sorts 1638-element
    chunks and keeps 1000 of each — a 128k-element merge sort, ~6.5 ms at
    batch 32 on v5e; xprof sort.22/sort.23). Choosing chunks near
    sqrt(n*k) shrinks the merge input to nchunks*k ~ 15k.

    Same value contract as lax.top_k: the returned VALUES are bit-exactly
    lax.top_k's (the k largest, descending). Indices always point at
    elements attaining those values and are in-range, but when more than
    `kk` copies of a tied value concentrate in a single chunk the index
    SET can differ from lax.top_k's global lowest-index-first tie order
    (each chunk can contribute at most kk entries, so overflow ties come
    from later chunks). The reference's host np.argsort breaks ties
    arbitrarily too, so either selection matches its semantics.
    """
    import math

    n = x.shape[-1]
    k = min(k, n)
    if chunk_target is None:
        chunk_target = int(math.sqrt(float(n) * k))
    nchunks = max(1, round(n / chunk_target))
    if nchunks <= 1 or n < 4 * k:
        return lax.top_k(x, k)
    c = -(-n // nchunks)
    pad = nchunks * c - n
    lead = x.shape[:-1]
    xp = jnp.pad(x, [(0, 0)] * len(lead) + [(0, pad)],
                 constant_values=-jnp.inf) if pad else x
    xc = xp.reshape(lead + (nchunks, c))
    kk = min(k, c)
    v1, i1 = lax.top_k(xc, kk)                  # (..., nchunks, kk)
    base = (jnp.arange(nchunks, dtype=jnp.int32) * c)[..., None]
    # Clamp pad positions (last chunk's -inf fill) into range: lowest-index
    # tie-breaking already prefers real elements over pads, but if a pad
    # ever surfaced (kk ~ c with real -inf values present) its index would
    # be >= n. The clamp makes that class impossible; values are unaffected.
    flat_idx = jnp.minimum((i1 + base).reshape(lead + (nchunks * kk,)),
                           jnp.int32(n - 1))
    v2, i2 = lax.top_k(v1.reshape(lead + (nchunks * kk,)), k)
    idx = jnp.take_along_axis(flat_idx, i2, axis=-1)
    return v2, idx
