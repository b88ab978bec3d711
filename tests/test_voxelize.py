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


def test_voxelize_budget_overflow(tiny_cfg, rng):
    """All three budgets binding at once: >max_pillars distinct cells,
    >max_kept_points capped rows, and one over-cap cell.  Exercises the
    sort-compaction truncation path (over-budget pillars are the highest
    cells, so they fall off the compacted tail first — same sequential
    budget the oracle applies)."""
    cfg = tiny_cfg
    n = cfg.max_points
    pts, _ = make_cloud(rng, cfg, n)
    # pile extra points into one cell to force the per-pillar cap too
    pts = np.asarray(pts).copy()
    pts[:20, 0] = pts[:20, 1] = 0.05
    out = voxelize(pts, np.int32(n), cfg)
    ref = oracles.voxelize_oracle(pts, n, cfg)

    count = int(out.pillar_count)
    assert count == cfg.max_pillars == len(ref["cells"])
    assert int(out.point_count) == sum(
        len(v) for v in ref["pillar_points"].values()) <= cfg.max_kept_points

    np.testing.assert_array_equal(np.asarray(out.coords)[:count],
                                  ref["coords"])
    num_points = np.asarray(out.num_points)
    for p in range(count):
        assert num_points[p] == len(ref["pillar_points"][p])
    # spot-check features of the capped pillar and the last kept pillar
    feats = np.asarray(out.point_feats)
    point_pillar = np.asarray(out.point_pillar)
    point_valid = np.asarray(out.point_valid)
    for p in (0, count - 1):
        if not len(ref["pillar_points"][p]):
            continue
        mine = feats[(point_pillar == p) & point_valid]
        ref_rows = ref["feats"][p]
        mine = mine[np.lexsort(mine.T)]
        ref_rows = ref_rows[np.lexsort(ref_rows.T)]
        np.testing.assert_allclose(mine, ref_rows, atol=1e-5)


def test_voxelize_deep_segments_full_cap(tiny_cfg, rng):
    """cap=48 (the real configs' value) exercises the pointer-jump rounds
    s=32 and s=16, which tiny_cfg's cap=8 never reaches: a 48-row segment
    must still get the bit-exact end-total copied to every row (means)."""
    import dataclasses
    cfg = dataclasses.replace(tiny_cfg, max_points_per_pillar=48)
    buf = np.zeros((cfg.max_points, 4), np.float32)
    m = 60  # one dense cell (over-cap) + a couple of small ones
    buf[:m, 0] = 0.05
    buf[:m, 1] = 0.05
    buf[:m, 2] = np.linspace(-1, 1, m)
    buf[:m, 3] = np.arange(m)
    buf[m] = [1.1, 1.1, 0.0, 1.0]
    buf[m + 1] = [-2.1, 3.3, 0.5, 2.0]
    n = m + 2
    out = voxelize(buf, np.int32(n), cfg)
    ref = oracles.voxelize_oracle(buf, n, cfg)
    count = int(out.pillar_count)
    assert count == len(ref["cells"]) == 3
    num_points = np.asarray(out.num_points)
    assert sorted(num_points[:count].tolist()) == sorted(
        len(v) for v in ref["pillar_points"].values())
    feats = np.asarray(out.point_feats)
    point_pillar = np.asarray(out.point_pillar)
    point_valid = np.asarray(out.point_valid)
    coords = np.asarray(out.coords)
    ref_by_cell = {tuple(ref["coords"][p]): ref["feats"][p]
                   for p in range(count)}
    for p in range(count):
        mine = feats[(point_pillar == p) & point_valid]
        ref_rows = ref_by_cell[tuple(coords[p])]
        assert mine.shape == ref_rows.shape
        np.testing.assert_allclose(mine[np.lexsort(mine.T)],
                                   ref_rows[np.lexsort(ref_rows.T)],
                                   atol=1e-5)


def test_points_out_of_range_dropped(tiny_cfg):
    cfg = tiny_cfg
    buf = np.zeros((cfg.max_points, 4), np.float32)
    buf[0] = [100.0, 0.0, 0.0, 1.0]   # out of x range
    buf[1] = [0.0, 0.0, 2.99, 1.0]    # inside
    buf[2] = [0.0, 0.0, 3.0, 1.0]     # z == max -> excluded ([min,max))
    out = voxelize(buf, np.int32(3), cfg)
    assert int(out.point_count) == 1
    assert int(out.pillar_count) == 1


def test_edge_binning_census_vs_reference_floor():
    """Census of the documented divergence (README divergence 5): edge-table
    binning vs the reference's fp32 floorf((v - min) / size)
    (points2Features.cu:687-688), over every in-range point of the three
    distinct bundled frames.  Asserts the divergence set is EXACTLY the
    sub-ulp boundary class — every divergent coordinate sits within one fp32
    ulp OF THE SHIFTED COORDINATE (v - vmin), the quantity the reference's
    own fp32 subtract quantizes, of a float64-exact grid line, and moves by
    exactly one bin — and reports the count.  (E.g. x = -2.75e-6 with
    vmin = -74.88: ulp(74.88f) = 7.6e-6 swallows the offset, so floorf bins
    it at x >= 0 while the true grid line is 0.0.)"""
    import os
    import pytest

    ref_bin = "/root/reference/data/bin"
    if not os.path.isdir(ref_bin):
        pytest.skip("reference data absent")

    from dsvt_ai_trt_tpu.config import DEFAULT_CONFIG
    from dsvt_ai_trt_tpu.ops.voxelize import cell_edges

    cfg = DEFAULT_CONFIG
    total = diverged = 0
    for frame in ("000000", "000003", "000004"):
        pts = np.fromfile(os.path.join(ref_bin, frame + ".bin"),
                          np.float32).reshape(-1, 4)
        in_range = np.ones(len(pts), bool)
        for a in range(3):
            in_range &= ((pts[:, a] >= cfg.pc_range_min[a])
                         & (pts[:, a] < cfg.pc_range_max[a]))
        pts = pts[in_range]
        for a, (vmin, vsize, n) in enumerate(
                zip(cfg.pc_range_min, cfg.voxel_size,
                    (cfg.grid_size[0], cfg.grid_size[1], cfg.grid_size[2]))):
            v = pts[:, a]
            # the reference rule, in the same fp32 ops CUDA uses
            # (correctly-rounded fp32 subtract/divide, then floor)
            q_ref = np.floor((v - np.float32(vmin)) / np.float32(vsize))
            q_ref = np.clip(q_ref.astype(np.int64), 0, n - 1)
            edges = cell_edges(vmin, vsize, n)
            q_edge = np.clip(np.searchsorted(edges, v, "right") - 1, 0, n - 1)

            total += len(v)
            diff = np.nonzero(q_ref != q_edge)[0]
            diverged += len(diff)
            for i in diff:
                hi = max(q_ref[i], q_edge[i])
                assert abs(q_ref[i] - q_edge[i]) == 1, (
                    frame, a, v[i], q_ref[i], q_edge[i])
                edge64 = np.float64(vmin) + np.float64(vsize) * np.float64(hi)
                dist = abs(np.float64(v[i]) - edge64)
                shifted_ulp = np.spacing(np.float32(
                    abs(np.float64(v[i]) - np.float64(vmin))))
                assert dist <= shifted_ulp, (
                    f"{frame} axis{a}: divergent point {v[i]!r} is "
                    f"{dist:.3e} from edge {edge64!r} — beyond one ulp of "
                    f"the shifted coordinate ({shifted_ulp:.3e})")
    # the measured census (cited in README divergence 5)
    print(f"binning census: {diverged}/{total} coords diverge "
          f"(all sub-ulp boundary class)")
    assert diverged < total * 1e-3


def test_map_to_bev_matches_dense_reference(rng):
    """The flat sorted/unique-hinted scatter (ops/bev.py) must equal the
    dense loop semantics of Map2Bev_kernel (plugins/src/map2bev.cu:250-266):
    valid pillar rows land at their (iy, ix) cell, everything else zero."""
    import jax.numpy as jnp
    from dsvt_ai_trt_tpu.ops.bev import map_to_bev

    H, W, C, P = 9, 11, 6, 20
    nv = 13
    cells = np.sort(rng.choice(H * W, nv, replace=False)).astype(np.int32)
    coords = np.zeros((P, 2), np.int32)
    coords[:nv, 0] = cells // W
    coords[:nv, 1] = cells % W
    valid = np.arange(P) < nv
    feats = rng.normal(0, 1, (P, C)).astype(np.float32)

    got = np.asarray(map_to_bev(jnp.asarray(feats), jnp.asarray(coords),
                                jnp.asarray(valid), (H, W)))
    want = np.zeros((H, W, C), np.float32)
    for i in range(nv):
        want[coords[i, 0], coords[i, 1]] = feats[i]
    np.testing.assert_array_equal(got, want)
