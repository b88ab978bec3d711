import numpy as np
import pytest
import jax.numpy as jnp

from dsvt_ai_trt_tpu.ops.nms import pairwise_rotated_overlap, nms

import oracles


def _random_boxes(rng, n):
    boxes = np.zeros((n, 9), np.float32)
    boxes[:, 0] = rng.uniform(-20, 20, n)   # x
    boxes[:, 1] = rng.uniform(-20, 20, n)   # y
    boxes[:, 2] = rng.uniform(-2, 2, n)     # z
    boxes[:, 3] = rng.uniform(0.5, 6, n)    # dim0 (local-y extent)
    boxes[:, 4] = rng.uniform(0.5, 3, n)    # dim1 (local-x extent)
    boxes[:, 5] = rng.uniform(0.5, 3, n)
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    boxes[:, 7] = rng.integers(0, 3, n)
    boxes[:, 8] = np.sort(rng.uniform(0.3, 1.0, n))[::-1]  # descending score
    return boxes


@pytest.mark.slow  # 13 s cold; subsumed by test_nms_matches_oracle end to end
def test_pairwise_overlap_matches_oracle(rng):
    n = 24
    boxes = _random_boxes(rng, n)
    # force clusters of overlapping boxes
    boxes[1, :2] = boxes[0, :2] + 0.3
    boxes[2, :2] = boxes[0, :2] + 0.1
    boxes[2, 6] = boxes[0, 6] + 0.4
    ov = np.asarray(pairwise_rotated_overlap(jnp.asarray(boxes)))
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            ref = oracles.box_overlap_oracle(boxes[i], boxes[j])
            assert abs(ov[i, j] - ref) < 1e-2 + 1e-3 * max(ref, 1.0), (i, j, ov[i, j], ref)


def test_identical_boxes_full_overlap(rng):
    # n=24 so this shares the jit cache entry with the oracle test above
    boxes = _random_boxes(rng, 24)
    boxes[1] = boxes[0]
    boxes[1, 8] = boxes[0, 8] - 0.01
    ov = np.asarray(pairwise_rotated_overlap(jnp.asarray(boxes)))
    area = boxes[0, 3] * boxes[0, 4]
    assert abs(ov[0, 1] - area) / area < 1e-3


def test_disjoint_boxes_zero_overlap(rng):
    # n=24 (padded with far-away rows) for jit cache reuse across tests
    boxes = _random_boxes(rng, 24)
    boxes[:, 0] = np.arange(24) * 100.0  # spread everything far apart
    boxes[0] = [0, 0, 0, 2, 2, 2, 0.3, 0, 0.9]
    boxes[1] = [10, 10, 0, 2, 2, 2, -0.3, 0, 0.8]
    ov = np.asarray(pairwise_rotated_overlap(jnp.asarray(boxes)))
    assert ov[0, 1] == 0.0


def test_nms_matches_oracle(rng):
    n = 40
    boxes = _random_boxes(rng, n)
    # build overlap clusters
    for c in range(0, n - 4, 5):
        boxes[c + 1:c + 4, :2] = boxes[c, :2] + rng.uniform(-0.5, 0.5, (3, 2))
    count = n - 3  # a few padding rows
    boxes[count:] = 0
    kept, kcount = nms(jnp.asarray(boxes), jnp.int32(count), 0.01)
    ref_keep = oracles.nms_oracle(boxes, count, 0.01)
    assert int(kcount) == len(ref_keep)
    kept = np.asarray(kept)[:int(kcount)]
    ref_boxes = boxes[sorted(ref_keep)]
    mine_sorted = kept[np.lexsort(kept.T)]
    ref_sorted = ref_boxes[np.lexsort(ref_boxes.T)]
    np.testing.assert_allclose(mine_sorted, ref_sorted, atol=1e-6)


@pytest.mark.slow
def test_clip_overlap_matches_reference_algorithm(rng):
    from dsvt_ai_trt_tpu.ops.nms import pairwise_overlap_clip
    n = 32
    boxes = _random_boxes(rng, n)
    for c in range(0, n - 4, 5):
        boxes[c + 1:c + 4, :2] = boxes[c, :2] + rng.uniform(-0.6, 0.6, (3, 2))
        boxes[c + 1, 6] = boxes[c, 6] + 0.3
    ref = np.asarray(pairwise_rotated_overlap(jnp.asarray(boxes)))
    fast = np.asarray(pairwise_overlap_clip(jnp.asarray(boxes)))
    np.testing.assert_allclose(fast, ref, atol=5e-3, rtol=1e-3)


@pytest.mark.slow
def test_pallas_overlap_matches_clip(rng):
    from dsvt_ai_trt_tpu.ops.nms import pairwise_overlap_clip
    from dsvt_ai_trt_tpu.ops.nms_pallas import pairwise_overlap_pallas
    n = 48
    boxes = _random_boxes(rng, n)
    for c in range(0, n - 4, 5):
        boxes[c + 1:c + 4, :2] = boxes[c, :2] + rng.uniform(-0.6, 0.6, (3, 2))
    ref = np.asarray(pairwise_overlap_clip(jnp.asarray(boxes)))
    got = np.asarray(pairwise_overlap_pallas(jnp.asarray(boxes), interpret=True))
    # the kernel's contract is the strict upper triangle (all NMS reads);
    # below-diagonal TILES are zero-skipped
    iu = np.triu_indices(n, 1)
    np.testing.assert_allclose(got[iu], ref[iu], atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_pallas_overlap_triangle_skip(rng):
    """A grid big enough to have fully-below-diagonal tiles (n > 128):
    upper triangle exact, skipped tiles zero."""
    from dsvt_ai_trt_tpu.ops.nms import pairwise_overlap_clip
    from dsvt_ai_trt_tpu.ops.nms_pallas import pairwise_overlap_pallas
    n = 200
    boxes = _random_boxes(rng, n)
    ref = np.asarray(pairwise_overlap_clip(jnp.asarray(boxes)))
    got = np.asarray(pairwise_overlap_pallas(jnp.asarray(boxes), interpret=True))
    iu = np.triu_indices(n, 1)
    np.testing.assert_allclose(got[iu], ref[iu], atol=1e-4, rtol=1e-4)
    assert np.all(got[144:, :128] == 0.0)  # tiles with i >= 16*(j+1)


@pytest.mark.slow  # 24 s cold; the divisible-K oracle gate stays in the fast suite
def test_nms_non_divisible_k_matches_oracle(rng):
    """K with no divisor <=64 (prime) must stay fast AND exact: the chunked
    suppression pads K up to a multiple of the chunk size."""
    n = 67  # prime
    boxes = _random_boxes(rng, n)
    for c in range(0, n - 4, 5):
        boxes[c + 1:c + 4, :2] = boxes[c, :2] + rng.uniform(-0.5, 0.5, (3, 2))
    count = n - 2
    boxes[count:] = 0
    kept, kcount = nms(jnp.asarray(boxes), jnp.int32(count), 0.01)
    ref_keep = oracles.nms_oracle(boxes, count, 0.01)
    assert int(kcount) == len(ref_keep)
    kept = np.asarray(kept)[:int(kcount)]
    ref_boxes = boxes[sorted(ref_keep)]
    np.testing.assert_allclose(kept[np.lexsort(kept.T)],
                               ref_boxes[np.lexsort(ref_boxes.T)], atol=1e-6)
