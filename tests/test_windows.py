import numpy as np

from dsvt_ai_trt_tpu.ops.voxelize import voxelize
from dsvt_ai_trt_tpu.ops.windows import window_partition, set_partition

from conftest import make_cloud
import oracles


def _parts(cfg, rng, n=900):
    pts, n = make_cloud(rng, cfg, n)
    vox = voxelize(pts, n, cfg)
    return vox


def test_set_partition_matches_oracle(tiny_cfg, rng):
    cfg = tiny_cfg
    vox = _parts(cfg, rng)
    coords = np.asarray(vox.coords)
    valid = np.asarray(vox.pillar_valid)
    for spec in cfg.window_specs:
        wp = window_partition(vox.coords, vox.pillar_valid, spec, cfg)
        sp = set_partition(wp, vox.pillar_valid, spec, cfg)
        ref_inds, ref_mask, ref_count = oracles.set_partition_oracle(
            coords, valid, spec, cfg)
        assert int(sp.set_count) == ref_count
        np.testing.assert_array_equal(
            np.asarray(sp.inds)[:, :ref_count], ref_inds[:, :ref_count])
        np.testing.assert_array_equal(
            np.asarray(sp.key_mask)[:ref_count], ref_mask[:ref_count])


def test_invalid_sets_carry_dead_masks(tiny_cfg, rng):
    """Sets >= set_count must be ALL-dead in key_mask: the fused kernel's
    occupancy gate (ops/attention_pallas.py) skips those blocks and writes
    zeros, which equals the ungated math only when their masks kill every
    key (fully-dead segments hard-zero)."""
    cfg = tiny_cfg
    vox = _parts(cfg, rng)
    for spec in cfg.window_specs:
        wp = window_partition(vox.coords, vox.pillar_valid, spec, cfg)
        sp = set_partition(wp, vox.pillar_valid, spec, cfg)
        count = int(sp.set_count)
        assert count < cfg.max_sets, "need invalid sets to exercise the claim"
        assert (np.asarray(sp.key_mask)[count:] < 0).all()


def test_canonical_inverse(tiny_cfg, rng):
    """Every valid pillar's canonical slot must point back at itself."""
    cfg = tiny_cfg
    vox = _parts(cfg, rng)
    valid = np.asarray(vox.pillar_valid)
    K = cfg.set_size
    for spec in cfg.window_specs:
        wp = window_partition(vox.coords, vox.pillar_valid, spec, cfg)
        sp = set_partition(wp, vox.pillar_valid, spec, cfg)
        inds = np.asarray(sp.inds)
        canon = np.asarray(sp.canon)
        for axis in range(2):
            flat = inds[axis].reshape(-1)
            for p in np.nonzero(valid)[0]:
                c = canon[axis, p]
                assert c < cfg.max_sets * K, f"pillar {p} unmapped"
                assert flat[c] == p, (axis, p, c, flat[c])


def test_mask_marks_first_occurrence_unmasked(tiny_cfg, rng):
    cfg = tiny_cfg
    vox = _parts(cfg, rng)
    for spec in cfg.window_specs:
        wp = window_partition(vox.coords, vox.pillar_valid, spec, cfg)
        sp = set_partition(wp, vox.pillar_valid, spec, cfg)
        inds = np.asarray(sp.inds)
        mask = np.asarray(sp.key_mask)
        count = int(sp.set_count)
        for s in range(count):
            row = inds[0, s]
            assert mask[s, 0] == 0.0
            for k in range(1, cfg.set_size):
                if row[k] == row[k - 1]:
                    assert mask[s, k] < 0
                else:
                    assert mask[s, k] == 0.0


def test_window_coords_shift(tiny_cfg):
    """Shifted partition: coords offset by shift before division/modulo
    (windowPartition.cu:292-298, 352-354)."""
    cfg = tiny_cfg
    spec = cfg.window_specs[1]  # 24x24 shift (6,6)
    coords = np.array([[0, 0], [10, 20], [40, 40]], np.int32)
    buf = np.zeros((cfg.max_pillars, 2), np.int32)
    buf[:3] = coords
    valid = np.zeros((cfg.max_pillars,), bool)
    valid[:3] = True
    wp = window_partition(buf, valid, spec, cfg)
    nwx = cfg.sparse_shape[0] // 24 + 1
    for i, (iy, ix) in enumerate(coords):
        wx_id = (ix + 6) // 24
        wy_id = (iy + 6) // 24
        assert int(np.asarray(wp.win_id)[i]) == wy_id * nwx + wx_id
        assert int(np.asarray(wp.inwin_xyz)[i, 0]) == (ix + 6) % 24
        assert int(np.asarray(wp.inwin_xyz)[i, 1]) == (iy + 6) % 24
        np.testing.assert_allclose(
            np.asarray(wp.xy_centered)[i],
            [(ix + 6) % 24 - 12.0, (iy + 6) % 24 - 12.0])


def test_set_cap_overflow_graceful(tiny_cfg, rng):
    """More sets than max_sets: the overflow is dropped deterministically
    (the reference would overflow its [800,36] buffers unchecked); pillars
    in dropped sets keep a well-defined canon dump slot."""
    import dataclasses
    cfg = dataclasses.replace(tiny_cfg, max_sets=8)
    vox = _parts(cfg, rng, n=1500)
    spec = cfg.window_specs[0]
    wp = window_partition(vox.coords, vox.pillar_valid, spec, cfg)
    sp = set_partition(wp, vox.pillar_valid, spec, cfg)
    assert int(sp.set_count) == 8
    inds = np.asarray(sp.inds)
    canon = np.asarray(sp.canon)
    K = cfg.set_size
    valid = np.asarray(vox.pillar_valid)
    for axis in range(2):
        flat = inds[axis].reshape(-1)
        for p in np.nonzero(valid)[0]:
            c = canon[axis, p]
            if c < cfg.max_sets * K:
                assert flat[c] == p  # mapped pillars still invert correctly
    # dropped sets' slots carry the dump index
    assert (inds[:, 8:] == cfg.max_pillars).all()


def test_more_windows_than_pillar_cap(tiny_cfg, rng):
    """W == max_pillars regression: when the grid holds more windows than
    the pillar cap (the flagship 468-row grid at a reduced-cap dryrun:
    1600 windows vs P = 1024), the window-extent slices reach
    starts_w[W + 1] and used to over-run the [P + 1] starts table by one
    row (shape error at trace time).  Pillars must still invert through
    canon exactly."""
    import dataclasses
    cfg = dataclasses.replace(tiny_cfg, max_pillars=16)
    assert (cfg.window_specs[0].num_windows(cfg.sparse_shape)[0]
            * cfg.window_specs[0].num_windows(cfg.sparse_shape)[1]
            > cfg.max_pillars)
    vox = _parts(cfg, rng, n=700)
    valid = np.asarray(vox.pillar_valid)
    for spec in cfg.window_specs:
        wp = window_partition(vox.coords, vox.pillar_valid, spec, cfg)
        sp = set_partition(wp, vox.pillar_valid, spec, cfg)
        inds = np.asarray(sp.inds)
        canon = np.asarray(sp.canon)
        for axis in range(2):
            flat = inds[axis].reshape(-1)
            for p in np.nonzero(valid)[0]:
                c = canon[axis, p]
                if c < cfg.max_sets * cfg.set_size:
                    assert flat[c] == p


def test_duplicate_slots_produce_identical_attention_outputs(tiny_cfg, rng):
    """SURVEY §2.4-6: the reference's last-writer-wins scatter-back is
    nondeterministic on duplicated (Eq.(3)-padded) set slots, and our
    canonical-slot gather replaces it.  The divergence is provably zero
    because duplicate slots hold the same pillar: same query row, same key
    set, same additive mask => identical attention outputs.  This test pins
    that claim: every duplicated slot's output must be bit-identical to its
    first occurrence, so ANY scatter order (or our gather) yields the same
    pillar features."""
    import jax.numpy as jnp
    from dsvt_ai_trt_tpu.ops.windows import window_partition, set_partition
    from dsvt_ai_trt_tpu.ops.attention import set_attention_qkv
    from dsvt_ai_trt_tpu.ops.voxelize import voxelize
    from conftest import make_cloud

    cfg = tiny_cfg
    # sparse cloud -> windows with fewer pillars than set_size -> duplicates
    pts, n = make_cloud(rng, cfg, 60)
    vox = voxelize(jnp.asarray(pts), jnp.int32(n), cfg)
    spec = cfg.window_specs[0]
    wp = window_partition(vox.coords, vox.pillar_valid, spec, cfg)
    sp = set_partition(wp, vox.pillar_valid, spec, cfg)
    inds = np.asarray(sp.inds[0])
    S, K = inds.shape
    assert (inds[:, 1:] == inds[:, :-1]).any(), "no duplicate slots planted"

    C = cfg.d_model
    table = rng.normal(0, 1, (cfg.max_pillars, C)).astype(np.float32)
    q = jnp.asarray(table)
    qkv = jnp.concatenate([q, q, q], axis=-1)
    out = np.asarray(set_attention_qkv(qkv, sp.inds[0], sp.key_mask,
                                       cfg.num_heads, "fp32"))
    for s in range(S):
        for k in range(1, K):
            if inds[s, k] == inds[s, k - 1] and inds[s, k] < cfg.max_pillars:
                np.testing.assert_array_equal(
                    out[s, k], out[s, k - 1],
                    err_msg=f"set {s} slot {k} diverged from its duplicate")
