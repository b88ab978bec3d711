"""Pallas segmented-max scan vs the XLA scatter path (ops/scatter.py).

Contract (ops/segment_pallas.py): ids sorted, segments contiguous and at
most `cap` rows; rows of over-cap segments (only the voxelizer's invalid-
sentinel tail can be one) are undefined and masked by every caller.
Interpret mode so the CPU suite covers it; the device path is exercised
by bench and tools/parity_check.py.
"""

import numpy as np
import jax.numpy as jnp

from dsvt_ai_trt_tpu.ops.segment_pallas import (segmented_max, _plan,
                                                plan_available)


def _stream(rng, N, P, cap, n_valid):
    ids = []
    p = 0
    while len(ids) < n_valid and p < P:
        ids += [p] * int(rng.integers(1, cap + 1))
        p += 1
    ids = np.asarray(ids[:n_valid] + [P] * (N - min(len(ids), n_valid)),
                     np.int32)
    is_start = np.concatenate([[True], ids[1:] != ids[:-1]])
    return ids, is_start


def test_segmented_max_matches_reference(rng):
    N, C, CAP, P = 1920, 16, 48, 600
    ids, is_start = _stream(rng, N, P, CAP, 1700)
    feats = rng.normal(0, 1, (N, C)).astype(np.float32)
    got = np.asarray(segmented_max(jnp.asarray(feats), jnp.asarray(is_start),
                                   CAP, interpret=True))
    starts = np.flatnonzero(is_start)
    ends = np.append(starts[1:], N)
    for s, e in zip(starts, ends):
        if e - s <= CAP:  # over-cap (sentinel tail) rows are undefined
            want = np.broadcast_to(feats[s:e].max(0), (e - s, C))
            np.testing.assert_allclose(got[s:e], want,
                                       err_msg=f"segment {s}:{e}")


def test_segmented_max_starts_only(rng):
    """starts_only: segment-START rows carry the full segment max (the only
    rows the vfe pillar-table gather reads); other rows are undefined."""
    N, C, CAP, P = 1920, 16, 48, 600
    ids, is_start = _stream(rng, N, P, CAP, 1700)
    feats = rng.normal(0, 1, (N, C)).astype(np.float32)
    got = np.asarray(segmented_max(jnp.asarray(feats), jnp.asarray(is_start),
                                   CAP, interpret=True, starts_only=True))
    starts = np.flatnonzero(is_start)
    ends = np.append(starts[1:], N)
    for s, e in zip(starts, ends):
        if e - s <= CAP:
            np.testing.assert_allclose(got[s], feats[s:e].max(0),
                                       err_msg=f"segment {s}:{e}")


def test_segmented_max_single_point_segments(rng):
    """Degenerate all-singleton stream: output == input."""
    N, C = 384, 8
    feats = rng.normal(0, 1, (N, C)).astype(np.float32)
    is_start = np.ones(N, bool)
    got = np.asarray(segmented_max(jnp.asarray(feats), jnp.asarray(is_start),
                                   48, interpret=True))
    np.testing.assert_array_equal(got, feats)


def test_plan_rules():
    assert _plan(30000, 48) is not None          # nuScenes default
    assert _plan(140000, 48) is not None         # Waymo caps
    assert not plan_available(30000, 100)        # cap beyond scan window
    assert not plan_available(997, 48)           # prime row count
    R, halo = _plan(30000, 48)
    assert R % halo == 0 and 30000 % R == 0 and halo >= 48
