import numpy as np
import jax.numpy as jnp

from detectron_tpu.ops import nms as nms_ops
from detectron_tpu.utils import boxes as box_utils


def _rand_dets(rng, n, size=100):
    x1 = rng.uniform(0, size, n)
    y1 = rng.uniform(0, size, n)
    w = rng.uniform(5, 40, n)
    h = rng.uniform(5, 40, n)
    scores = rng.uniform(0, 1, n)
    return np.stack([x1, y1, x1 + w, y1 + h, scores], axis=1).astype(np.float32)


def test_nms_matches_host_reference():
    rng = np.random.RandomState(0)
    for trial in range(5):
        n = [10, 50, 200, 333, 512][trial]
        dets = _rand_dets(rng, n)
        thresh = [0.3, 0.5, 0.7][trial % 3]
        keep_ref = box_utils.nms(dets, thresh)

        idx, valid = nms_ops.nms_padded(
            jnp.asarray(dets[:, :4]),
            jnp.asarray(dets[:, 4]),
            thresh,
            max_output_size=n,
            tile_size=64,
        )
        keep_tpu = np.asarray(idx)[np.asarray(valid)]
        np.testing.assert_array_equal(np.sort(keep_ref), np.sort(keep_tpu))
        # Order: score-descending, same as reference keep order
        np.testing.assert_array_equal(keep_ref, keep_tpu)


def test_nms_with_padding_and_topk():
    rng = np.random.RandomState(1)
    dets = _rand_dets(rng, 100)
    # Pad with invalid entries (score -inf)
    boxes = np.concatenate([dets[:, :4], np.zeros((28, 4), np.float32)])
    scores = np.concatenate(
        [dets[:, 4], np.full((28,), -np.inf, np.float32)]
    )
    keep_ref = box_utils.nms(dets, 0.5)
    k = min(10, len(keep_ref))

    idx, valid = nms_ops.nms_padded(
        jnp.asarray(boxes), jnp.asarray(scores), 0.5, max_output_size=10
    )
    assert int(np.asarray(valid).sum()) == k
    np.testing.assert_array_equal(np.asarray(idx)[:k], keep_ref[:k])


def test_nms_all_invalid():
    boxes = np.zeros((16, 4), np.float32)
    scores = np.full((16,), -np.inf, np.float32)
    idx, valid = nms_ops.nms_padded(
        jnp.asarray(boxes), jnp.asarray(scores), 0.5, max_output_size=4
    )
    assert not np.asarray(valid).any()


def test_soft_nms_linear_decays_scores():
    # Two heavily overlapping boxes + one far box.
    dets = np.array(
        [
            [0, 0, 10, 10, 0.9],
            [1, 1, 11, 11, 0.8],
            [50, 50, 60, 60, 0.7],
        ],
        dtype=np.float32,
    )
    out, inds = box_utils.soft_nms(dets, method="linear", overlap_thresh=0.3)
    assert len(inds) == 3  # nothing dropped, scores decayed
    by_ind = {int(i): out[k, 4] for k, i in enumerate(inds)}
    assert by_ind[0] == np.float32(0.9)
    assert by_ind[1] < 0.8  # decayed by overlap with box 0
    assert by_ind[2] == np.float32(0.7)


def test_pallas_nms_matches_padded():
    import jax

    from detectron_tpu.ops.pallas import nms_kernel

    rng = np.random.RandomState(7)
    L, N = 6, 64
    boxes = np.zeros((L, N, 4), np.float32)
    scores = np.zeros((L, N), np.float32)
    for l in range(L):
        dets = _rand_dets(rng, N)
        order = np.argsort(-dets[:, 4])
        boxes[l] = dets[order, :4]
        scores[l] = dets[order, 4]
        # random invalid tail
        n_valid = rng.randint(10, N)
        scores[l, n_valid:] = -np.inf
    idx_p, valid_p = nms_kernel.nms_many(
        jnp.asarray(boxes), jnp.asarray(scores), 0.5, max_output_size=N,
        lanes_per_step=2, interpret=True)
    for l in range(L):
        idx_r, valid_r = nms_ops.nms_padded(
            jnp.asarray(boxes[l]), jnp.asarray(scores[l]), 0.5,
            max_output_size=N, tile_size=32, presorted=True)
        kp = np.asarray(idx_p[l])[np.asarray(valid_p[l])]
        kr = np.asarray(idx_r)[np.asarray(valid_r)]
        np.testing.assert_array_equal(kp, kr)
