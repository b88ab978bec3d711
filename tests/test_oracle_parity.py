"""End-to-end parity against the independent torch oracle.

The oracle (tools/torch_oracle.py) re-implements the reference engine's exact
graph (src/dsvt-ai-trt.cpp:532-1762) on stock torch modules, loads weights
through its own .wts parser (so the gen_wts format and the fused-QKV split
are exercised via torch's nn.MultiheadAttention semantics rather than our
reading of helper.h:353-434), and runs the dynamic stages as serial
emulations of the CUDA kernels.  This test drives both implementations with
the same random checkpoint on the distinct bundled LiDAR frames and asserts
box-level agreement — the "parity is a theorem, not a vibe" gate.
"""

import os

import numpy as np
import pytest

import dataclasses

from dsvt_ai_trt_tpu.config import DSVTConfig
from dsvt_ai_trt_tpu import weights

REF_BIN = "/root/reference/data/bin"
# the ten bundled frames contain exactly three distinct clouds
FRAMES = ["000000", "000003", "000004"]

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    """Calibrated synthetic checkpoint (weights.calibrated_raw): only a
    sparse set of confident boxes clears the score threshold, so the
    per-class top-k waterline never truncates and box membership is stable
    across implementations — parity asserts at 1.0 outside a thin
    threshold-margin band instead of the loose 0.85 the raw random
    checkpoint allows."""
    import jax.numpy as jnp
    from tools.torch_oracle import load_bin

    cfg = DSVTConfig(parity_atan=True)  # fp32, exact topk, reference atan
    pts = load_bin(os.path.join(REF_BIN, "000000.bin"))
    buf = np.zeros((cfg.max_points, 4), np.float32)
    buf[: len(pts)] = pts
    raw = weights.calibrated_raw(cfg, jnp.asarray(buf), jnp.int32(len(pts)),
                                 seed=0, n_boxes=40)
    wts = tmp_path_factory.mktemp("oracle") / "dsvt.wts"
    weights.save_wts(raw, str(wts))
    return cfg, raw, str(wts)


@pytest.mark.skipif(not os.path.isdir(REF_BIN), reason="reference data absent")
def test_end_to_end_box_parity(checkpoint):
    import torch
    from tools.torch_oracle import DSVTOracle, run_oracle, load_bin

    cfg, raw, wts_path = checkpoint
    torch.set_num_threads(os.cpu_count() or 4)

    oracle = DSVTOracle()
    oracle.load_wts(wts_path)

    import jax.numpy as jnp
    from dsvt_ai_trt_tpu.model.detector import forward_jit

    params = weights.prepare_params(raw, cfg)

    for frame in FRAMES:
        pts = load_bin(os.path.join(REF_BIN, f"{frame}.bin"))
        boxes_o = run_oracle(oracle, pts, parity_atan=True)

        buf = np.zeros((cfg.max_points, 4), np.float32)
        buf[: len(pts)] = pts
        dets = forward_jit(params, jnp.asarray(buf), jnp.int32(len(pts)),
                           cfg, with_nms=False)
        count = int(dets.count)
        boxes_j = np.asarray(dets.boxes)[:count]

        _assert_box_parity(boxes_o, boxes_j, frame)


@pytest.mark.skipif(not os.path.isdir(REF_BIN), reason="reference data absent")
def test_post_nms_oracle_parity(checkpoint):
    """Close the one stage the pre-NMS parity gate skips: run the oracle's
    serial helper.h NMS (tests/oracles.py:nms_oracle, re-derived from
    helper.h:257-283) on the oracle's boxes and compare KEPT sets against
    the in-graph device NMS output, all 3 frames (VERDICT r2 task 7).

    At IoU 0.01 survivors are well-separated, so kept sets must agree
    box-for-box outside (a) the score threshold-margin band and (b)
    suppression-margin churn: a survivor on one side may be absent on the
    other only if it overlaps one of that side's kept boxes (i.e. its
    suppressor flipped due to ~1e-4 score reordering)."""
    import torch
    import jax.numpy as jnp
    from tools.torch_oracle import DSVTOracle, run_oracle, load_bin
    from oracles import nms_oracle, box_overlap_oracle
    from dsvt_ai_trt_tpu.model.detector import forward_jit

    cfg, raw, wts_path = checkpoint
    torch.set_num_threads(os.cpu_count() or 4)
    oracle = DSVTOracle()
    oracle.load_wts(wts_path)
    params = weights.prepare_params(raw, cfg)

    def overlaps_kept(box, kept, thresh=cfg.nms_threshold):
        for kb in kept:
            if int(kb[7]) != int(box[7]):
                continue
            ov = box_overlap_oracle(box, kb)
            iou = ov / max(box[3] * box[4] + kb[3] * kb[4] - ov, 1e-8)
            if iou >= thresh * 0.5:
                return True
        return False

    for frame in FRAMES:
        pts = load_bin(os.path.join(REF_BIN, f"{frame}.bin"))
        boxes_o = run_oracle(oracle, pts, parity_atan=True)
        keep = nms_oracle(boxes_o, len(boxes_o), cfg.nms_threshold)
        kept_o = boxes_o[keep]

        buf = np.zeros((cfg.max_points, 4), np.float32)
        buf[: len(pts)] = pts
        dets = forward_jit(params, jnp.asarray(buf), jnp.int32(len(pts)),
                           cfg, with_nms=True)
        kept_j = np.asarray(dets.boxes)[: int(dets.count)]

        margin = 0.3 + 5e-3
        for mine, theirs, tag in ((kept_o, kept_j, "oracle"),
                                  (kept_j, kept_o, "jax")):
            for b in mine:
                if b[8] < margin:
                    continue  # threshold-band churn, documented
                d = np.hypot(theirs[:, 0] - b[0], theirs[:, 1] - b[1])
                same = theirs[:, 7] == b[7]
                ok = np.any(same & (d < 0.5))
                assert ok or overlaps_kept(b, theirs), (
                    f"{frame}: confident {tag} NMS survivor has no "
                    f"counterpart and no suppression-margin witness: {b}")
        # the two kept sets must agree in size up to the churn bands
        assert abs(len(kept_o) - len(kept_j)) <= max(
            3, int(0.1 * max(len(kept_o), len(kept_j)))), (
            f"{frame}: kept-set sizes diverge: oracle {len(kept_o)} "
            f"vs jax {len(kept_j)}")


@pytest.mark.skipif(not os.path.isdir(REF_BIN), reason="reference data absent")
def test_voxelizer_caps_nonbinding():
    """The oracle now enforces the reference's compaction buffer caps
    (MAX_PILLARS_NUM / MAX_POINTS_NUM_1, points2Features.cu:732-766 +
    params.h:25-26).  Assert (a) neither cap binds on any bundled frame —
    so capping cannot explain away a parity failure — and (b) the caps DO
    truncate on a synthetic overflow, i.e. they are really implemented."""
    from tools.torch_oracle import (voxelize, load_bin, MAX_PILLARS,
                                    MAX_KEPT_POINTS)

    for frame in FRAMES:
        pts = load_bin(os.path.join(REF_BIN, f"{frame}.bin"))
        feats, point_pillar, coords, counts = voxelize(pts)
        assert len(coords) < MAX_PILLARS, frame
        assert len(feats) < MAX_KEPT_POINTS, frame

    # synthetic overflow: 110 x 110 = 12100 occupied cells of one point each
    g = np.arange(110, dtype=np.float32) * 0.32 - 17.0 + 0.16
    xs, ys = np.meshgrid(g, g)
    over = np.stack([xs.ravel(), ys.ravel(),
                     np.zeros(xs.size, np.float32),
                     np.ones(xs.size, np.float32)], axis=1)
    feats, point_pillar, coords, counts = voxelize(over)
    assert len(coords) == MAX_PILLARS
    assert len(feats) == MAX_PILLARS  # one point per pillar here


@pytest.mark.skipif(not os.path.isdir(REF_BIN), reason="reference data absent")
def test_unfolded_export_loads_in_oracle(tmp_path):
    """Trained-parameter export contract: params -> unfold_params ->
    save_wts must load into the torch oracle (torch defines the shape/name
    contract), and re-folding reproduces the same pytree (exactness of the
    identity-BN encoding is covered at tiny size in test_training)."""
    from tools.torch_oracle import DSVTOracle

    cfg = DSVTConfig()
    params = weights.random_params(cfg, seed=3)
    raw = weights.unfold_params(params, cfg)
    wts = str(tmp_path / "trained.wts")
    weights.save_wts(raw, wts)
    oracle = DSVTOracle()
    oracle.load_wts(wts)  # raises on any name/shape mismatch
    import torch
    w = oracle.backbone_3d.stage_0[0].encoder_list[0].win_attn.self_attn.in_proj_weight
    np.testing.assert_allclose(
        w.detach().numpy()[: cfg.d_model],
        np.asarray(params["blocks"][0]["enc"][0]["wq"]).T, atol=1e-7)


def _assert_box_parity(boxes_o, boxes_j, frame, score_atol=1e-3,
                       match_radius=0.5, threshold_margin=5e-3):
    """Greedy same-class nearest-center matching, asserted at 1.0.

    With the calibrated checkpoint the selection waterline is the 0.3
    score threshold itself, so EVERY box clearing it by `threshold_margin`
    must have a counterpart with the same cell/score/geometry; only boxes
    inside the thin margin band may flip membership (fp32
    accumulation-order differences shift scores by ~1e-4).
    """
    used_j = np.zeros(len(boxes_j), bool)
    matched = confident = 0
    for bo in boxes_o:
        is_confident = bo[8] >= 0.3 + threshold_margin
        confident += int(is_confident)
        cand = np.where((~used_j) & (boxes_j[:, 7] == bo[7]))[0]
        d = (np.hypot(boxes_j[cand, 0] - bo[0], boxes_j[cand, 1] - bo[1])
             if len(cand) else np.array([np.inf]))
        if len(cand) == 0 or d.min() > match_radius:
            assert not is_confident, (
                f"{frame}: confident oracle box unmatched "
                f"(min dist {d.min():.2f}): {bo}")
            continue
        bj = boxes_j[cand[np.argmin(d)]]
        used_j[cand[np.argmin(d)]] = True
        matched += 1
        assert abs(bj[8] - bo[8]) <= score_atol, (
            f"{frame}: score mismatch {bj[8]} vs {bo[8]} at {bo[:2]}")
        np.testing.assert_allclose(bj[:3], bo[:3], atol=2e-2,
                                   err_msg=f"{frame}: center mismatch")
        np.testing.assert_allclose(bj[3:6], bo[3:6], rtol=2e-2,
                                   err_msg=f"{frame}: dim mismatch")
        assert abs(bj[6] - bo[6]) < 5e-2, (
            f"{frame}: heading mismatch {bj[6]} vs {bo[6]}")

    # unmatched ours must also be threshold-marginal
    for bj in boxes_j[~used_j]:
        assert bj[8] < 0.3 + threshold_margin, (
            f"{frame}: confident jax box unmatched: {bj}")

    assert confident >= 5, (
        f"{frame}: calibration produced too few confident boxes "
        f"({confident}; oracle {len(boxes_o)}, jax {len(boxes_j)})")
    assert matched >= confident, f"{frame}: {matched} < {confident} matched"
