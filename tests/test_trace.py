"""Unit tests for the device-trace parser (runtime/trace.py).

The parser feeds bench.py's per-stage device table, so its contracts —
main-program window selection, op aggregation, source_stack-based stage
attribution — are pinned here against a handcrafted Chrome-trace JSON of
the shape the TPU runtime emits (see module docstring of runtime/trace.py
for the observed anatomy).
"""

import gzip
import json
import os

from dsvt_ai_trt_tpu.runtime.trace import parse_trace, _stage_for


def _write_trace(tmp_path, events):
    d = tmp_path / "plugins" / "profile" / "run1"
    os.makedirs(d)
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    return str(tmp_path)


def _prog(ts, dur, name="jit_forward(123)"):
    return {"ph": "X", "pid": 3, "tid": 2, "ts": ts, "dur": dur,
            "name": name, "args": {"run_id": "1"}}


def _op(ts, dur, name, source="", stack="", flops=0):
    return {"ph": "X", "pid": 3, "tid": 3, "ts": ts, "dur": dur,
            "name": name,
            "args": {"long_name": f"%{name} = ...", "hlo_category": "fusion",
                     "source": source, "source_stack": stack,
                     "model_flops": str(flops)}}


META = [
    {"ph": "M", "pid": 3, "name": "process_name",
     "args": {"name": "/device:TPU:0"}},
    {"ph": "M", "pid": 701, "name": "process_name",
     "args": {"name": "/host:CPU"}},
]


def test_parse_aggregates_and_windows(tmp_path):
    events = META + [
        _prog(1000.0, 100.0),            # dispatch 1
        _prog(2000.0, 110.0),            # dispatch 2
        # helper program (sync readback) — must NOT open a window
        _prog(3000.0, 5.0, name="jit_ravel(9)"),
        # ops inside the dispatches
        _op(1010.0, 40.0, "fusion.1", source="a/voxelize.py:10", flops=100),
        _op(2010.0, 42.0, "fusion.1", source="a/voxelize.py:10", flops=100),
        _op(1060.0, 30.0, "fusion.2", source="a/backbone2d.py:37"),
        # op inside the helper program's window — must be excluded
        _op(3001.0, 4.0, "fusion.3", source="a/nms.py:1"),
    ]
    prof = parse_trace(_write_trace(tmp_path, events), n_iters=2)
    assert abs(prof.device_ms_per_iter - 0.105) < 1e-9  # (100+110)/2 us
    by_name = {r["name"]: r for r in prof.op_rows}
    assert by_name["fusion.1"]["calls"] == 2
    assert abs(by_name["fusion.1"]["ms"] - 0.082) < 1e-9
    assert by_name["fusion.1"]["flops"] == 200.0
    assert "fusion.3" not in by_name
    stages = prof.stage_ms()
    assert abs(stages["voxelize"] - 0.041) < 1e-9      # per iter
    assert abs(stages["bev_backbone2d"] - 0.015) < 1e-9


def test_stage_attribution_outermost_frame_wins():
    # CenterHead conv emitted via backbone2d._conv: innermost frame says
    # backbone2d, the outermost model frame says head -> center_head
    stack = ("/r/dsvt_ai_trt_tpu/model/backbone2d.py:37:8\n"
             "/r/dsvt_ai_trt_tpu/model/head.py:52:12\n"
             "/r/dsvt_ai_trt_tpu/model/detector.py:58:15\n"
             "/tmp/driver.py:21:26\n")
    assert _stage_for("backbone2d.py:37", "fusion.9", stack) == "center_head"
    # plain backbone2d conv keeps its stage
    stack2 = ("/r/dsvt_ai_trt_tpu/model/backbone2d.py:37:8\n"
              "/r/dsvt_ai_trt_tpu/model/detector.py:55:11\n")
    assert _stage_for("backbone2d.py:37", "fusion.9", stack2) == "bev_backbone2d"
    # no stack: fall back to source file
    assert _stage_for("/x/ops/voxelize.py:100", "f") == "voxelize"
    # pallas custom-calls without python source
    assert _stage_for("", "encoder_epilogue_kernel") == "dsvt_blocks"
    assert _stage_for("", "somewhere.unknown") == "other"


def test_stage_ops_decomposes_by_source_line():
    """stage_ops (bench's sparse_ops block, VERDICT r4 task 5) aggregates a
    stage's ops by emitting source line, falls back to the HLO name prefix
    for source-less ops (Pallas custom-calls), divides by n_iters, and
    returns [] for stages with no rows."""
    from dsvt_ai_trt_tpu.runtime.trace import DeviceProfile

    rows = [
        {"stage": "voxelize", "ms": 3.0, "flops": 1e9, "name": "fusion.12",
         "category": "fusion", "source": "voxelize.py:137"},
        {"stage": "voxelize", "ms": 1.0, "flops": 0.0, "name": "sort.3",
         "category": "sort", "source": "voxelize.py:137"},
        {"stage": "voxelize", "ms": 0.5, "flops": 0.0, "name": "fusion.9",
         "category": "fusion", "source": ""},
        {"stage": "dsvt_blocks", "ms": 2.0, "flops": 5e9,
         "name": "custom-call.4", "category": "custom-call", "source": ""},
    ]
    p = DeviceProfile([6.5], rows, 2)
    vox = p.stage_ops("voxelize")
    assert vox[0] == {"op": "voxelize.py:137", "ms": 2.0, "gflop": 0.5,
                      "hlo": "fusion.12", "category": "fusion"}
    assert vox[1]["op"] == "fusion" and vox[1]["ms"] == 0.25
    blk = p.stage_ops("dsvt_blocks")
    assert blk[0]["op"] == "custom-call" and blk[0]["gflop"] == 2.5
    assert p.stage_ops("vfe") == []
