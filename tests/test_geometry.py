"""Geometry-generalization sweep (VERDICT r3 task 6).

A framework must not have K=36 / 12x12 windows / 468-grid baked into its
correctness.  This matrix drives the sparse partition stack and the full
detector over geometries the other tests never touch — different set
sizes, window shapes, model widths, and a grid that is NOT a window
multiple — asserting NumPy-oracle agreement for the partition ops and
box-level self-consistency for the end-to-end program.

Reference analogue: Eq.(3) set partitioning is size-generic in the CUDA
too (getSet.cu:326-350); the reference only ever compiles one geometry,
this suite proves ours at several.
"""

import dataclasses

import numpy as np
import pytest

from dsvt_ai_trt_tpu import weights
from dsvt_ai_trt_tpu.config import DSVTConfig, WindowSpec
from dsvt_ai_trt_tpu.model.detector import forward_jit
from dsvt_ai_trt_tpu.ops.voxelize import voxelize
from dsvt_ai_trt_tpu.ops.windows import window_partition, set_partition

from conftest import make_cloud, tiny_config
import oracles


def _geometry(name: str) -> DSVTConfig:
    base = tiny_config()
    if name == "k24_w16":
        # set size 24 (neither the default 36 nor the tiny 12), 16x16
        # windows: 48/16 = 3 exact windows per axis
        cfg = dataclasses.replace(
            base, set_size=24,
            window_specs=(WindowSpec((16, 16, 1), (0, 0, 0)),
                          WindowSpec((16, 16, 1), (8, 8, 0))))
    elif name == "k48":
        # sets larger than the default's 36 on the default window pair
        cfg = dataclasses.replace(base, set_size=48)
    elif name == "uneven_grid":
        # 40 is NOT a multiple of 12 or 24: the +1 padded window row
        # (config.WindowSpec.num_windows, windowPartition.cu:425-427) is
        # exercised with real out-of-range remainder cells; K=20 also
        # breaks any gcd(K, 8) lane assumption (gcd=4)
        cfg = dataclasses.replace(
            base, grid_size=(40, 40, 1), sparse_shape=(40, 40, 1),
            pc_range_min=(-6.4, -6.4, -5.0), pc_range_max=(6.4, 6.4, 3.0),
            set_size=20,
            window_specs=(WindowSpec((12, 12, 1), (0, 0, 0)),
                          WindowSpec((24, 24, 1), (6, 6, 0))))
    elif name == "wide_d128":
        # wider model: d_model 128 / 4 heads (head_dim 32), ffn 256
        cfg = dataclasses.replace(
            base, d_model=128, ffn_dim=256, num_heads=4,
            pfn_channels=(64, 128), set_size=24,
            window_specs=(WindowSpec((16, 16, 1), (0, 0, 0)),
                          WindowSpec((16, 16, 1), (8, 8, 0))))
    else:  # pragma: no cover
        raise KeyError(name)
    cfg.validate()
    return cfg


GEOMETRIES = ["k24_w16", "k48", "uneven_grid", "wide_d128"]


@pytest.mark.parametrize("name", GEOMETRIES)
def test_partition_matches_oracle(name, rng):
    """voxelize + set partition agree with the NumPy oracles at every
    geometry (fast: small jits + serial oracles, no detector compile)."""
    cfg = _geometry(name)
    pts, n = make_cloud(rng, cfg, 900)
    vox = voxelize(pts, n, cfg)
    ref_vox = oracles.voxelize_oracle(pts, int(n), cfg)
    assert int(vox.pillar_count) == len(ref_vox["cells"])
    coords = np.asarray(vox.coords)
    valid = np.asarray(vox.pillar_valid)
    for spec in cfg.window_specs:
        wp = window_partition(vox.coords, vox.pillar_valid, spec, cfg)
        sp = set_partition(wp, vox.pillar_valid, spec, cfg)
        ref_inds, ref_mask, ref_count = oracles.set_partition_oracle(
            coords, valid, spec, cfg)
        assert int(sp.set_count) == ref_count, (name, spec.shape)
        np.testing.assert_array_equal(
            np.asarray(sp.inds)[:, :ref_count], ref_inds[:, :ref_count])
        np.testing.assert_array_equal(
            np.asarray(sp.key_mask)[:ref_count], ref_mask[:ref_count])


@pytest.mark.parametrize("name", ["k24_w16", "uneven_grid"])
def test_forward_self_consistent(name, rng):
    """Full detector at off-default geometries: finite, deterministic, and
    invariant to input point order (box-level self-consistency)."""
    cfg = _geometry(name)
    params = weights.random_params(cfg, seed=5)
    pts, n = make_cloud(rng, cfg, 700)
    d1 = forward_jit(params, pts, n, cfg, False)
    d2 = forward_jit(params, pts, n, cfg, False)
    assert np.isfinite(np.asarray(d1.boxes)).all()
    np.testing.assert_array_equal(np.asarray(d1.boxes), np.asarray(d2.boxes))
    perm = rng.permutation(int(n))
    pts3 = pts.copy()
    pts3[: int(n)] = pts[: int(n)][perm]
    d3 = forward_jit(params, pts3, n, cfg, False)
    assert int(d3.count) == int(d1.count)
    c = int(d1.count)
    np.testing.assert_allclose(np.asarray(d1.boxes)[:c],
                               np.asarray(d3.boxes)[:c], atol=1e-3, rtol=1e-3)


@pytest.mark.slow
@pytest.mark.parametrize("name", ["k48", "wide_d128"])
def test_forward_self_consistent_slow(name, rng):
    """The two heavier geometries run the same gate in the slow suite."""
    cfg = _geometry(name)
    params = weights.random_params(cfg, seed=5)
    pts, n = make_cloud(rng, cfg, 700)
    d1 = forward_jit(params, pts, n, cfg, False)
    assert np.isfinite(np.asarray(d1.boxes)).all()
    perm = rng.permutation(int(n))
    pts2 = pts.copy()
    pts2[: int(n)] = pts[: int(n)][perm]
    d2 = forward_jit(params, pts2, n, cfg, False)
    assert int(d2.count) == int(d1.count)
    c = int(d1.count)
    np.testing.assert_allclose(np.asarray(d1.boxes)[:c],
                               np.asarray(d2.boxes)[:c], atol=1e-3, rtol=1e-3)
