"""Golden end-to-end regression tests.

The reference's only systematic test is the golden-run smoke test on the
bundled frames (SURVEY §4).  Here it is a real regression gate at two
sizes:

  * ``test_frame0_golden`` (slow) — full default config on the real
    nuScenes-mini frame 000000.bin: per-stage statistics AND the exact
    post-NMS ``[count, 9]`` box rows (fp32, exact top-k, CPU backend).
  * ``test_tiny_golden`` (fast) — the reduced-grid config on a synthetic
    cloud, same value-level pinning, runs in seconds for every-commit CI.

Regenerate after an intentional semantic change:
    PYTHONPATH=. python tests/test_golden.py regen
"""

import json
import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
GOLDEN = os.path.join(GOLDEN_DIR, "frame0_seed0.json")
GOLDEN_TINY = os.path.join(GOLDEN_DIR, "tiny_seed0.json")
FRAME = "/root/reference/data/bin/000000.bin"


def _stats(x):
    x = np.asarray(x, np.float64)
    return {
        "mean": float(x.mean()),
        "std": float(x.std()),
        "absmax": float(np.abs(x).max()),
    }


def _run():
    from dsvt_ai_trt_tpu.config import DEFAULT_CONFIG
    from dsvt_ai_trt_tpu import weights
    from dsvt_ai_trt_tpu.model.detector import forward_debug, forward_jit
    from dsvt_ai_trt_tpu.io.pointcloud import load_bin

    cfg = DEFAULT_CONFIG
    params = weights.random_params(cfg, seed=0)
    pts, n = load_bin(FRAME, cfg.max_points)
    dbg = forward_debug(params, pts, n, cfg)
    dets = forward_jit(params, pts, n, cfg, True)
    count = int(dets.count)

    out = {
        "pillar_count": int(dbg.pillars.pillar_count),
        "point_count": int(dbg.pillars.point_count),
        "pillar_feats": _stats(dbg.pillar_feats),
        "dsvt_feats": _stats(dbg.dsvt_feats),
        "bev_features": _stats(dbg.bev_features),
        "hm": _stats(dbg.head_out["hm"]),
        "center": _stats(dbg.head_out["center"]),
        "rot": _stats(dbg.head_out["rot"]),
        "nms_count": count,
        # exact value-level golden: the final box rows (VERDICT r1 task 5)
        "boxes": np.asarray(dets.boxes)[:count].tolist(),
    }
    return out


def _tiny_run():
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from conftest import make_cloud, tiny_config
    from dsvt_ai_trt_tpu import weights
    from dsvt_ai_trt_tpu.model.detector import forward_jit

    cfg = tiny_config()
    params = weights.random_params(cfg, seed=0)
    pts, n = make_cloud(np.random.default_rng(1234), cfg, 1500)
    dets = forward_jit(params, pts, n, cfg, True)
    count = int(dets.count)
    return {
        "count": count,
        "boxes": np.asarray(dets.boxes)[:count].tolist(),
    }


def _assert_boxes(got, ref, atol=1e-4):
    got = np.asarray(got, np.float32)
    ref = np.asarray(ref, np.float32)
    assert got.shape == ref.shape, f"box count {got.shape} vs {ref.shape}"
    if got.size:
        np.testing.assert_allclose(got, ref, atol=atol, rtol=1e-4)


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(FRAME), reason="no reference data")
def test_frame0_golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("golden not generated yet")
    got = _run()
    with open(GOLDEN) as f:
        ref = json.load(f)
    assert got["pillar_count"] == ref["pillar_count"]
    assert got["point_count"] == ref["point_count"]
    assert got["nms_count"] == ref["nms_count"]
    for key in ("pillar_feats", "dsvt_feats", "bev_features", "hm", "center",
                "rot"):
        for stat in ("mean", "std"):
            np.testing.assert_allclose(
                got[key][stat], ref[key][stat], rtol=1e-3, atol=1e-5,
                err_msg=f"{key}.{stat}")
    _assert_boxes(got["boxes"], ref["boxes"])


def test_tiny_golden():
    if not os.path.exists(GOLDEN_TINY):
        pytest.skip("tiny golden not generated yet")
    got = _tiny_run()
    with open(GOLDEN_TINY) as f:
        ref = json.load(f)
    assert got["count"] == ref["count"]
    _assert_boxes(got["boxes"], ref["boxes"])


if __name__ == "__main__":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    with open(GOLDEN_TINY, "w") as f:
        json.dump(_tiny_run(), f, indent=1)
    print(f"tiny golden regenerated -> {GOLDEN_TINY}")
    out = _run()
    with open(GOLDEN, "w") as f:
        json.dump(out, f, indent=1)
    print(f"golden regenerated -> {GOLDEN}")
