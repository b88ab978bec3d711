import numpy as np

from dsvt_ai_trt_tpu.ops.voxelize import voxelize
from dsvt_ai_trt_tpu.ops.scatter import scatter_max

from conftest import make_cloud
import oracles


def test_voxelize_matches_oracle(tiny_cfg, rng):
    cfg = tiny_cfg
    pts, n = make_cloud(rng, cfg, 1200)
    out = voxelize(pts, n, cfg)
    ref = oracles.voxelize_oracle(pts, int(n), cfg)

    count = int(out.pillar_count)
    assert count == len(ref["cells"])

    coords = np.asarray(out.coords)[:count]
    np.testing.assert_array_equal(coords, ref["coords"])

    # per-pillar point membership and counts
    point_pillar = np.asarray(out.point_pillar)
    point_valid = np.asarray(out.point_valid)
    num_points = np.asarray(out.num_points)
    for p in range(count):
        assert num_points[p] == len(ref["pillar_points"][p])

    # per-point features: compare as sets of rows per pillar
    feats = np.asarray(out.point_feats)
    for p in range(count):
        mine = feats[(point_pillar == p) & point_valid]
        ref_rows = ref["feats"][p]
        assert mine.shape == ref_rows.shape
        mine_sorted = mine[np.lexsort(mine.T)]
        ref_sorted = ref_rows[np.lexsort(ref_rows.T)]
        np.testing.assert_allclose(mine_sorted, ref_sorted, atol=1e-5)


def test_voxelize_cap(tiny_cfg, rng):
    """All points into one cell: membership capped at max_points_per_pillar."""
    cfg = tiny_cfg
    buf = np.zeros((cfg.max_points, 4), np.float32)
    m = 30
    buf[:m, 0] = 0.05
    buf[:m, 1] = 0.05
    buf[:m, 2] = np.linspace(-1, 1, m)
    buf[:m, 3] = np.arange(m)
    out = voxelize(buf, np.int32(m), cfg)
    assert int(out.pillar_count) == 1
    assert int(out.num_points[0]) == cfg.max_points_per_pillar
    # the first `cap` points in file order are kept
    kept = np.asarray(out.point_feats)[np.asarray(out.point_valid)]
    np.testing.assert_array_equal(np.sort(kept[:, 3]),
                                  np.arange(cfg.max_points_per_pillar))


def test_scatter_max_matches_oracle(tiny_cfg, rng):
    cfg = tiny_cfg
    pts, n = make_cloud(rng, cfg, 800)
    vox = voxelize(pts, n, cfg)
    feats = rng.normal(size=(cfg.max_kept_points, 16)).astype(np.float32)
    pm, vm = scatter_max(feats, vox.point_pillar, vox.point_valid, cfg.max_pillars)
    pm_ref, vm_ref = oracles.scatter_max_oracle(
        feats, np.asarray(vox.point_pillar), np.asarray(vox.point_valid),
        cfg.max_pillars)
    np.testing.assert_allclose(np.asarray(vm), vm_ref, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pm), pm_ref, atol=1e-6)


def test_points_out_of_range_dropped(tiny_cfg):
    cfg = tiny_cfg
    buf = np.zeros((cfg.max_points, 4), np.float32)
    buf[0] = [100.0, 0.0, 0.0, 1.0]   # out of x range
    buf[1] = [0.0, 0.0, 2.99, 1.0]    # inside
    buf[2] = [0.0, 0.0, 3.0, 1.0]     # z == max -> excluded ([min,max))
    out = voxelize(buf, np.int32(3), cfg)
    assert int(out.point_count) == 1
    assert int(out.pillar_count) == 1
