"""Target assigner, synthetic scenes, train loop, and checkpoint tests
(VERDICT r1 task 7: training as a full capability)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dsvt_ai_trt_tpu import weights
from dsvt_ai_trt_tpu.data import (assign_targets, gaussian_radius,
                                  synthetic_scene, synthetic_batch)
from dsvt_ai_trt_tpu.parallel.training import (
    make_train_step, save_train_state, load_train_state, Targets)

from conftest import make_cloud


def test_assign_targets_peak_and_reg(tiny_cfg):
    cfg = tiny_cfg
    vx, vy, _ = cfg.voxel_size
    xmin, ymin, _ = cfg.pc_range_min
    # one box at a known location
    x, y = 2.0, -3.0
    box = np.array([[x, y, -1.0, 4.0, 1.8, 1.5, 0.7, 1]], np.float32)
    hm, reg, mask = assign_targets(box, cfg)
    ix = int((x - xmin) / vx)
    iy = int((y - ymin) / vy)
    assert hm[iy, ix, 1] == 1.0
    assert mask[iy, ix] == 1.0
    # dense_reg supervises the rotated footprint (~dx*dy/(vx*vy) cells),
    # single-cell mode exactly the center
    area_cells = 4.0 * 1.8 / (vx * vy)
    assert 0.4 * area_cells <= mask.sum() <= 1.6 * area_cells
    _, _, mask1 = assign_targets(box, cfg, dense_reg=False)
    assert mask1.sum() == 1.0
    # gaussian must decay but stay positive next to the peak
    assert 0 < hm[iy, ix + 1, 1] < 1.0
    # reg encodes what the decoder inverts (ops/postprocess.py)
    np.testing.assert_allclose(
        (ix + reg[iy, ix, 0]) * vx + xmin, x, atol=1e-5)
    np.testing.assert_allclose(
        (iy + reg[iy, ix, 1]) * vy + ymin, y, atol=1e-5)
    np.testing.assert_allclose(np.exp(reg[iy, ix, 3:6]), [4.0, 1.8, 1.5],
                               rtol=1e-5)
    np.testing.assert_allclose(np.arctan2(reg[iy, ix, 7], reg[iy, ix, 6]),
                               0.7, atol=1e-5)
    # every supervised cell's offset points back at the SAME box center,
    # and carries the same tail targets — the field the peak-cell decode
    # samples is spatially consistent
    ys, xs = np.nonzero(mask)
    np.testing.assert_allclose((xs + reg[ys, xs, 0]) * vx + xmin, x,
                               atol=1e-4)
    np.testing.assert_allclose((ys + reg[ys, xs, 1]) * vy + ymin, y,
                               atol=1e-4)
    np.testing.assert_allclose(reg[ys, xs, 6], np.cos(0.7), atol=1e-5)


def test_assign_targets_overlap_nearest_wins(tiny_cfg):
    """Two overlapping boxes: contested cells take the nearer center's
    field, and each box's own center cell is never clobbered."""
    cfg = tiny_cfg
    vx, vy, _ = cfg.voxel_size
    xmin, ymin, _ = cfg.pc_range_min
    boxes = np.array([[1.0, 0.0, -1.0, 4.0, 2.0, 1.5, 0.0, 1],
                      [3.5, 0.0, -1.0, 4.0, 2.0, 1.5, 0.0, 2]], np.float32)
    hm, reg, mask = assign_targets(boxes, cfg)
    for x, y, cls in ((1.0, 0.0, 1), (3.5, 0.0, 2)):
        ix = int((x - xmin) / vx)
        iy = int((y - ymin) / vy)
        assert mask[iy, ix] == 1.0
        np.testing.assert_allclose((ix + reg[iy, ix, 0]) * vx + xmin, x,
                                   atol=1e-5)
    # every supervised cell decodes to one of the two true centers
    ys, xs = np.nonzero(mask)
    cx = (xs + reg[ys, xs, 0]) * vx + xmin
    near = np.minimum(np.abs(cx - 1.0), np.abs(cx - 3.5))
    assert near.max() < 1e-4


def test_gaussian_radius_monotone():
    assert gaussian_radius(20, 20) > gaussian_radius(5, 5) > 0


def test_synthetic_scene_points_inside_boxes(tiny_cfg):
    rng = np.random.default_rng(3)
    pts, n, gt = synthetic_scene(rng, tiny_cfg, n_objects=3, n_ground=500,
                                 pts_per_obj=50)
    assert int(n) > 500
    assert gt.shape == (3, 8)
    # object points must cluster near their box center
    for box in gt:
        d = np.hypot(pts[: int(n), 0] - box[0], pts[: int(n), 1] - box[1])
        assert (d < np.hypot(box[3], box[4])).sum() >= 30


@pytest.mark.slow
def test_loss_decreases_on_planted_scenes(tiny_cfg):
    cfg = tiny_cfg
    params = weights.random_params(cfg, seed=0)
    optimizer, train_step = make_train_step(cfg)
    opt_state = optimizer.init(params)
    step = jax.jit(train_step)
    rng = np.random.default_rng(0)
    # fixed batch: the loss on the same data must go down
    pts, ns, targets = synthetic_batch(rng, cfg, 2, n_objects=3,
                                       n_ground=400, pts_per_obj=40)
    losses = []
    for _ in range(6):
        params, opt_state, loss = step(params, opt_state, pts, ns, targets)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


@pytest.mark.slow  # 123 s cold: the remat/vmap equivalence theorem is a nightly gate
def test_remat_loss_and_grads_match_vmap(tiny_cfg):
    """The TPU training path (lax.map + jax.checkpoint, required to fit
    batch 2 in 16 GB HBM) must produce the same loss AND gradients as the
    vmap form the CPU suite runs."""
    from dsvt_ai_trt_tpu.parallel.training import batched_loss

    cfg = tiny_cfg
    params = weights.random_params(cfg, seed=1)
    rng = np.random.default_rng(1)
    pts, ns, targets = synthetic_batch(rng, cfg, 2, n_objects=2,
                                       n_ground=200, pts_per_obj=30)
    f_vmap = lambda p: batched_loss(p, pts, ns, targets, cfg, remat=False)
    f_remat = lambda p: batched_loss(p, pts, ns, targets, cfg, remat=True)
    l0, g0 = jax.value_and_grad(f_vmap)(params)
    l1, g1 = jax.value_and_grad(f_remat)(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)

    # The two lowerings reduce in different orders (batched vs sequential),
    # so per-element tolerances flake on deep-chain leaves; the honest gate
    # is each leaf's worst deviation relative to that leaf's gradient
    # scale — measured <= 1.3e-3 across every leaf (losses equal at 1e-5
    # rel).  5e-3 catches real math divergence with 4x margin.
    # absolute floor 5e-4: leaves whose TRUE gradient is ~0 (e.g. bk — a
    # uniform key bias cancels in the softmax) are noise-over-noise under
    # a pure relative gate
    def check(path, a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        d = np.abs(a - b).max()
        tol = max(5e-3 * np.abs(b).max(), 5e-4)
        assert d <= tol, f"{jax.tree_util.keystr(path)}: |d| {d:.2e} > {tol:.2e}"

    jax.tree_util.tree_map_with_path(check, g0, g1)


@pytest.mark.slow
def test_train_state_checkpoint_roundtrip(tiny_cfg, tmp_path):
    cfg = tiny_cfg
    params = weights.random_params(cfg, seed=1)
    optimizer, train_step = make_train_step(cfg)
    opt_state = optimizer.init(params)
    # run one real step so opt_state is non-trivial
    rng = np.random.default_rng(1)
    pts, ns, targets = synthetic_batch(rng, cfg, 1, n_objects=2,
                                       n_ground=300, pts_per_obj=30)
    params, opt_state, _ = jax.jit(train_step)(params, opt_state, pts, ns,
                                               targets)
    path = str(tmp_path / "state.npz")
    save_train_state(path, params, opt_state, step=7)
    p2, o2, step = load_train_state(path, params, opt_state)
    assert step == 7
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), params, p2)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), opt_state, o2)


def test_unfold_params_roundtrip(tiny_cfg, rng):
    """unfold_params must invert prepare_params up to the BN re-encoding:
    re-folding the exported raw dict reproduces the exact pytree, and the
    .wts round trip preserves it (the trained-weights export contract)."""
    cfg = tiny_cfg
    params = weights.random_params(cfg, seed=2)
    raw = weights.unfold_params(params, cfg)
    refolded = weights.prepare_params(raw, cfg)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6),
        params, refolded)

    # and through the .wts text format (fp32 hex is exact)
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.wts")
        weights.save_wts(raw, path)
        raw2 = weights.load_wts(path)
    for k in raw:
        np.testing.assert_array_equal(raw[k].ravel(), raw2[k].ravel(), err_msg=k)

    # the exported model must still produce identical boxes
    from dsvt_ai_trt_tpu.model.detector import forward_jit
    pts, n = make_cloud(np.random.default_rng(7), cfg, 800)
    a = forward_jit(params, pts, n, cfg, True)
    b = forward_jit(refolded, pts, n, cfg, True)
    assert int(a.count) == int(b.count)
    np.testing.assert_allclose(np.asarray(a.boxes), np.asarray(b.boxes),
                               atol=1e-5)


def test_dense_footprint_symmetric_about_center(tiny_cfg):
    """ADVICE r4: footprint membership measures from CELL CENTERS, so a box
    centered on a cell center supervises a footprint symmetric under
    180-degree rotation about that cell (the corner-based test skewed the
    boundary ring by half a cell)."""
    cfg = tiny_cfg
    vx, vy, _ = cfg.voxel_size
    xmin, ymin, _ = cfg.pc_range_min
    ix, iy = 24, 20
    x = (ix + 0.5) * vx + xmin
    y = (iy + 0.5) * vy + ymin
    box = np.array([[x, y, -1.0, 3.1, 1.7, 1.5, 0.3, 1]], np.float32)
    _, _, mask = assign_targets(box, cfg)
    ys, xs = np.nonzero(mask)
    flipped = set(zip(2 * iy - ys, 2 * ix - xs))
    assert flipped == set(zip(ys, xs))
