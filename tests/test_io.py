import os

import numpy as np
import pytest

from dsvt_ai_trt_tpu.io.pointcloud import load_bin
from dsvt_ai_trt_tpu.io.output import save_txt, load_txt, format_txt
from dsvt_ai_trt_tpu.io import host_nms

import oracles

REF_DATA = "/root/reference/data/bin"


def test_load_bin_roundtrip(tmp_path):
    pts = np.arange(40, dtype=np.float32).reshape(10, 4)
    path = str(tmp_path / "f.bin")
    pts.tofile(path)
    buf, n = load_bin(path, 16)
    assert n == 10
    np.testing.assert_array_equal(buf[:10], pts)
    assert (buf[10:] == 0).all()


def test_load_bin_truncates(tmp_path):
    pts = np.ones((20, 4), np.float32)
    path = str(tmp_path / "f.bin")
    pts.tofile(path)
    buf, n = load_bin(path, 8)
    assert n == 8


@pytest.mark.skipif(not os.path.isdir(REF_DATA), reason="no reference data")
def test_load_reference_frame():
    buf, n = load_bin(os.path.join(REF_DATA, "000000.bin"), 50000)
    assert n == 34537
    assert np.isfinite(buf[:n]).all()


def test_txt_roundtrip(tmp_path):
    boxes = np.zeros((3, 9), np.float32)
    boxes[0] = [1.5, -2.25, 0.5, 4.0, 2.0, 1.8, 0.7, 3, 0.91]
    boxes[1] = [-7.0, 8.0, -1.0, 3.5, 1.5, 1.6, -1.2, 0, 0.55]
    path = str(tmp_path / "out.txt")
    save_txt(boxes, 2, 0.0421, path)
    seconds, back = load_txt(path)
    assert abs(seconds - 0.0421) < 1e-6
    assert back.shape == (2, 9)
    np.testing.assert_allclose(back, boxes[:2], atol=1e-5)


def test_txt_format_matches_reference_layout():
    """First line seconds, rows 'x, y, z, l, w, h, rt, id, score'
    (helper.h:441-468)."""
    boxes = np.zeros((1, 9), np.float32)
    boxes[0] = [1, 2, 3, 4, 5, 6, 0.5, 7, 0.8]
    text = format_txt(boxes, 1, 0.123456)
    lines = text.strip().split("\n")
    assert lines[0] == "0.123456"
    vals = [v.strip() for v in lines[1].split(",")]
    assert len(vals) == 9
    assert float(vals[3]) == 4.0  # l = dim0
    assert float(vals[4]) == 5.0  # w = dim1
    assert vals[7] == "7"         # class id as int


def test_native_nms_matches_oracle(rng):
    if host_nms._load_native() is None:
        pytest.skip("native toolchain unavailable")
    n = 25
    boxes = np.zeros((n, 9), np.float32)
    boxes[:, 0] = rng.uniform(-15, 15, n)
    boxes[:, 1] = rng.uniform(-15, 15, n)
    boxes[:, 3] = rng.uniform(1, 5, n)
    boxes[:, 4] = rng.uniform(1, 3, n)
    boxes[:, 6] = rng.uniform(-3, 3, n)
    boxes[:, 8] = np.sort(rng.uniform(0.3, 1, n))[::-1]
    for c in range(0, n - 3, 4):
        boxes[c + 1:c + 3, :2] = boxes[c, :2] + rng.uniform(-0.4, 0.4, (2, 2))
    out, k = host_nms.nms_host(boxes, n, 0.01)
    ref = oracles.nms_oracle(boxes, n, 0.01)
    assert k == len(ref)
    got = out[:k][np.lexsort(out[:k].T)]
    want = boxes[sorted(ref)][np.lexsort(boxes[sorted(ref)].T)]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_native_bin_loader_matches_python(tmp_path):
    if host_nms._load_native() is None:
        pytest.skip("native toolchain unavailable")
    pts = np.random.default_rng(0).normal(size=(50, 4)).astype(np.float32)
    path = str(tmp_path / "f.bin")
    pts.tofile(path)
    buf_py, n_py = load_bin(path, 64)
    buf_c, n_c = host_nms.load_bin_native(path, 64)
    assert n_py == n_c
    np.testing.assert_array_equal(buf_py, buf_c)


def test_native_wts_parser_matches_python(tmp_path):
    if host_nms._load_native() is None:
        pytest.skip("native toolchain unavailable")
    from dsvt_ai_trt_tpu import weights
    sub = {"module.a.weight": np.random.default_rng(1).normal(
        size=(7, 3)).astype(np.float32),
        "module.b.bias": np.arange(5, dtype=np.float32)}
    wts = str(tmp_path / "t.wts")
    weights.save_wts(sub, wts)
    blob = str(tmp_path / "t.bin")
    index = str(tmp_path / "t.idx")
    count = host_nms.wts_to_blob_native(wts, blob, index)
    assert count == 2
    data = np.fromfile(blob, np.float32)
    entries = {}
    for line in open(index):
        name, off, n = line.split()
        entries[name] = data[int(off):int(off) + int(n)]
    np.testing.assert_array_equal(entries["module.a.weight"],
                                  sub["module.a.weight"].ravel())
    np.testing.assert_array_equal(entries["module.b.bias"], sub["module.b.bias"])


def test_html_viewer_payload(tmp_path):
    """The interactive WebGL export (tools/html_viewer.py, the Mayavi-scene
    counterpart): embedded buffers must decode to exactly what the shaders
    index — 4 floats/point (stride 16) and 6 floats/line-vertex (stride 24),
    24 line vertices per box (12 edges), frames stepped by arrow keys."""
    import base64
    import json
    import re

    from tools.html_viewer import write_html

    rng = np.random.default_rng(0)
    frames = []
    for i in range(2):
        pts = rng.uniform(-10, 10, (50 + i, 4)).astype(np.float32)
        boxes = np.zeros((3, 9), np.float32)
        boxes[:, 3:6] = [4.0, 1.8, 1.6]
        boxes[:, 7] = [0, 4, 9]
        boxes[:, 8] = 0.8
        frames.append({"name": f"f{i}", "points": pts, "boxes": boxes,
                       "seconds": 0.01})
    out = str(tmp_path / "v.html")
    write_html(frames, out)
    html = open(out).read()
    payload = json.loads(re.search(r"const FRAMES = (\[.*?\]);\n", html,
                                   re.S).group(1))
    assert len(payload) == 2
    for i, f in enumerate(payload):
        assert f["n_points"] == 50 + i
        pts = np.frombuffer(base64.b64decode(f["points_b64"]), np.float32)
        assert pts.shape == ((50 + i) * 4,)
        np.testing.assert_array_equal(
            pts.reshape(-1, 4), frames[i]["points"])
        lines = np.frombuffer(base64.b64decode(f["lines_b64"]), np.float32)
        assert f["n_line_verts"] == 3 * 24          # 3 boxes x 12 edges x 2
        assert lines.shape == (3 * 24 * 6,)
        assert len(f["rows"]) == 3
    # intensity-less points get zero-padded to stride 16
    f3 = {"name": "p3", "points": np.ones((5, 3), np.float32),
          "boxes": np.zeros((0, 9), np.float32)}
    write_html([f3], out)
    payload = json.loads(re.search(r"const FRAMES = (\[.*?\]);\n",
                                   open(out).read(), re.S).group(1))
    assert payload[0]["n_points"] == 5 and payload[0]["n_line_verts"] == 0
