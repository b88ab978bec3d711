import numpy as np

from dsvt_ai_trt_tpu.eval import match_boxes, parity_ok


def _boxes(rows):
    return np.array(rows, np.float32).reshape(-1, 9)


def test_identical_sets_match_fully():
    boxes = _boxes([
        [0, 0, 0, 4, 2, 1.5, 0.3, 1, 0.9],
        [10, 5, 0, 3, 1.5, 1.5, -0.4, 2, 0.8],
    ])
    stats = match_boxes(boxes, boxes)
    assert stats["n_match"] == 2
    assert stats["precision"] == 1.0 and stats["recall"] == 1.0
    assert stats["mean_iou"] > 0.99
    assert parity_ok(boxes, boxes)


def test_permuted_rows_still_match():
    boxes = _boxes([
        [0, 0, 0, 4, 2, 1.5, 0.3, 1, 0.9],
        [10, 5, 0, 3, 1.5, 1.5, -0.4, 2, 0.8],
        [-8, 3, 1, 2, 2, 2, 1.0, 1, 0.7],
    ])
    perm = boxes[[2, 0, 1]]
    stats = match_boxes(perm, boxes)
    assert stats["recall"] == 1.0 and stats["precision"] == 1.0


def test_class_mismatch_not_matched():
    a = _boxes([[0, 0, 0, 4, 2, 1.5, 0.3, 1, 0.9]])
    b = a.copy()
    b[0, 7] = 2
    stats = match_boxes(a, b)
    assert stats["n_match"] == 0
    stats = match_boxes(a, b, class_aware=False)
    assert stats["n_match"] == 1


def test_heading_mod_pi_equivalence():
    """atan vs atan2 heading (SURVEY 2.4-2): boxes differing by pi in
    heading are the same rectangle and must match."""
    a = _boxes([[0, 0, 0, 4, 2, 1.5, 0.3, 1, 0.9]])
    b = a.copy()
    b[0, 6] += np.pi
    stats = match_boxes(a, b)
    assert stats["n_match"] == 1
    assert stats["mean_iou"] > 0.99


def test_missing_box_hurts_recall():
    ref = _boxes([
        [0, 0, 0, 4, 2, 1.5, 0.3, 1, 0.9],
        [10, 5, 0, 3, 1.5, 1.5, -0.4, 2, 0.8],
    ])
    pred = ref[:1]
    stats = match_boxes(pred, ref)
    assert stats["recall"] == 0.5 and stats["precision"] == 1.0
    assert not parity_ok(pred, ref)
