import os

import numpy as np
import pytest

from dsvt_ai_trt_tpu import weights
from dsvt_ai_trt_tpu.runtime.compile import Engine, build_engine, load_engine
from dsvt_ai_trt_tpu.runtime.infer import run_frames
from dsvt_ai_trt_tpu.io.output import load_txt

from conftest import make_cloud


def _write_frames(tmp_path, rng, cfg, k=2):
    paths = []
    for i in range(k):
        pts, n = make_cloud(rng, cfg, 500 + 100 * i)
        path = str(tmp_path / f"{i:06d}.bin")
        pts[: int(n)].astype(np.float32).tofile(path)
        paths.append(path)
    return paths


@pytest.mark.slow
def test_engine_serialization_roundtrip(tiny_cfg, rng, tmp_path):
    """The -s / -d split: serialized engine == jit path, bit for bit."""
    cfg = tiny_cfg
    params = weights.random_params(cfg, seed=4)
    pts, n = make_cloud(rng, cfg, 700)

    blob = build_engine(params, cfg, str(tmp_path / "t.engine"), with_nms=True)
    exported = load_engine(str(tmp_path / "t.engine"))
    import jax.numpy as jnp
    d1 = exported.call(params, jnp.asarray(pts), jnp.int32(n))
    engine = Engine(params, cfg, with_nms=True)
    d2 = engine(pts, n)
    assert int(d1.count) == int(d2.count)
    c = int(d1.count)
    a = np.asarray(d1.boxes)[:c]
    b = np.asarray(d2.boxes)[:c]
    # the exported artifact and the live jit are separate compilations; fp
    # reassociation differs slightly, so compare sorted rows with tolerance
    np.testing.assert_allclose(a[np.lexsort(a.T)], b[np.lexsort(b.T)],
                               atol=2e-3, rtol=2e-3)
    assert len(blob) > 1000


@pytest.mark.slow  # 44 s cold; io format pinned by test_io, CLI driven by /verify + bench each round
def test_run_frames_writes_reference_format(tiny_cfg, rng, tmp_path):
    cfg = tiny_cfg
    params = weights.random_params(cfg, seed=4)
    engine = Engine(params, cfg, with_nms=True).warmup()
    paths = _write_frames(tmp_path, rng, cfg)
    out_dir = str(tmp_path / "outputs")
    results = run_frames(engine, paths, out_dir)
    assert len(results) == 2
    for r in results:
        txt = os.path.join(out_dir, r["frame"] + ".txt")
        assert os.path.exists(txt)
        seconds, boxes = load_txt(txt)
        assert seconds > 0
        assert len(boxes) == r["count"]


@pytest.mark.slow  # 24 s cold; scan==stream also pinned by test_scan_forward_matches_single
def test_run_frames_scan_matches_stream(tiny_cfg, rng, tmp_path):
    """The lax.scan throughput path (one dispatch per batch, tail padded
    by repetition) must produce the same boxes as the per-frame engine
    loop — separate compilations, so rows compare with fp tolerance."""
    from dsvt_ai_trt_tpu.runtime.infer import run_frames_scan

    cfg = tiny_cfg
    params = weights.random_params(cfg, seed=4)
    engine = Engine(params, cfg, with_nms=True).warmup()
    paths = _write_frames(tmp_path, rng, cfg)
    stream = run_frames(engine, paths)
    # batch 3 > 2 frames: exercises the tail-padding path too
    scan = run_frames_scan(params, cfg, paths, str(tmp_path / "scan_out"),
                           batch=3)
    assert [r["frame"] for r in scan] == [r["frame"] for r in stream]
    for rs, rt in zip(scan, stream):
        assert rs["count"] == rt["count"]
        a, b = np.asarray(rs["boxes"]), np.asarray(rt["boxes"])
        np.testing.assert_allclose(a[np.lexsort(a.T)], b[np.lexsort(b.T)],
                                   atol=2e-3, rtol=2e-3)
        txt = os.path.join(str(tmp_path / "scan_out"), rs["frame"] + ".txt")
        assert os.path.exists(txt)


@pytest.mark.slow
def test_run_frames_host_nms_matches_device_counts(tiny_cfg, rng, tmp_path):
    """Device NMS and host NMS must agree on the kept box set."""
    cfg = tiny_cfg
    params = weights.random_params(cfg, seed=4)
    paths = _write_frames(tmp_path, rng, cfg, k=1)

    dev = run_frames(Engine(params, cfg, with_nms=True).warmup(), paths)
    host = run_frames(Engine(params, cfg, with_nms=False).warmup(), paths,
                      host_nms=True)
    assert dev[0]["count"] == host[0]["count"]
    a = dev[0]["boxes"][np.lexsort(dev[0]["boxes"].T)]
    b = host[0]["boxes"][np.lexsort(host[0]["boxes"].T)]
    np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)

def test_engine_config_stamp_rejects_mismatch(tiny_cfg, rng, tmp_path):
    """A serialized engine refuses to load under a different config/NMS
    setting (the artifact is stamped at build time)."""
    import dataclasses
    cfg = tiny_cfg
    params = weights.random_params(cfg, seed=4)
    path = str(tmp_path / "t.engine")
    build_engine(params, cfg, path, with_nms=True)

    # matching load is fine
    load_engine(path, expect_cfg=cfg, expect_nms=True)

    with pytest.raises(ValueError, match="with_nms"):
        load_engine(path, expect_nms=False)
    other = dataclasses.replace(cfg, score_threshold=0.5)
    with pytest.raises(ValueError, match="different config"):
        load_engine(path, expect_cfg=other)
    with pytest.raises(ValueError):
        Engine(params, other, engine_path=path, with_nms=True)
