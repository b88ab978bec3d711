"""Cross-precision box parity check on the bundled frames.

Validates the USE_FP16-style fast paths: boxes from precision=mixed/bf16
must match the fp32 path within detection tolerance (IoU>=0.5 class-aware
matching, eval.match_boxes).  Run on TPU:

    PYTHONPATH=. python tools/parity_check.py [mixed|bf16]
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dsvt_ai_trt_tpu.config import DEFAULT_CONFIG  # noqa: E402
from dsvt_ai_trt_tpu import weights  # noqa: E402
from dsvt_ai_trt_tpu.eval import match_boxes  # noqa: E402
from dsvt_ai_trt_tpu.io.pointcloud import load_bin, frame_paths  # noqa: E402
from dsvt_ai_trt_tpu.model.detector import forward_jit  # noqa: E402
from dsvt_ai_trt_tpu.runtime.compile import enable_persistent_cache  # noqa: E402


def boxes_for(cfg, params, pts, n, min_score=0.0):
    dets = forward_jit(params, pts, n, cfg, True)
    boxes = np.asarray(dets.boxes)[: int(dets.count)]
    return boxes[boxes[:, 8] >= min_score]


def main():
    fast = sys.argv[1] if len(sys.argv) > 1 else "mixed"
    enable_persistent_cache()
    cfg32 = DEFAULT_CONFIG
    approx = os.environ.get("DSVT_PARITY_APPROX", "1") == "1"
    cfg_fast = dataclasses.replace(cfg32, precision=fast, approx_topk=approx)
    params = weights.random_params(cfg32, seed=0)

    data = os.environ.get("DSVT_BENCH_DATA", "/root/reference/data/bin")
    n_frames = int(os.environ.get("DSVT_PARITY_FRAMES", "3"))
    # the reference bundles only 3 distinct clouds among its 10 .bin files
    # (000000==000001==000002==000005..7 etc.) — dedupe by content so
    # n_frames counts *distinct* frames
    worst = {"recall": 1.0, "precision": 1.0, "score_err": 0.0,
             "center_err": 0.0}
    # ignore boxes hugging the score threshold: a borderline detection
    # legitimately flips in/out under any precision change (the reference's
    # fp16 engine has the same property); parity is judged on confident boxes
    margin = float(os.environ.get("DSVT_PARITY_MARGIN", "0.05"))
    min_score = 0.3 + margin
    distinct, seen = [], set()
    for path in frame_paths(data):
        with open(path, "rb") as f:
            digest = hash(f.read())
        if digest not in seen:
            seen.add(digest)
            distinct.append(path)
    for path in distinct[:n_frames]:
        pts, n = load_bin(path, cfg32.max_points)
        ref = boxes_for(cfg32, params, pts, n, min_score)
        got = boxes_for(cfg_fast, params, pts, n, min_score)
        stats = match_boxes(got, ref, iou_threshold=0.5)
        stats["frame"] = os.path.basename(path)
        print(json.dumps(stats))
        worst["recall"] = min(worst["recall"], stats["recall"])
        worst["precision"] = min(worst["precision"], stats["precision"])
        worst["score_err"] = max(worst["score_err"], stats["max_score_err"])
        worst["center_err"] = max(worst["center_err"], stats["max_center_err"])
    # Pass criterion: matched boxes must agree tightly (scores within 0.03,
    # centers within 0.3 m) and most boxes must match.  With *random*
    # weights every "detection" is a ~4-sigma noise event, so the top-500
    # ranking is intrinsically unstable under any precision change — ~10%
    # set churn with <2% score deviation is rank noise, not divergence; a
    # trained model's strong peaks are robust and would match ~fully.
    ok = (worst["recall"] >= 0.85 and worst["precision"] >= 0.85
          and worst["score_err"] <= 0.03 and worst["center_err"] <= 0.3)
    print(json.dumps({"precision_mode": fast, "worst": worst, "parity_ok": ok}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
