"""Trace-derived per-stage DEVICE timing.

The stage timers in runtime/profiler.py sync each stage through a host
readback, so on the tunneled axon runtime every entry carries a ~28 ms RTT
— fine for ranking nothing.  This module gets the truth the way the
hardware reports it: capture a ``jax.profiler`` trace of the *fused*
program, parse the Chrome-trace JSON the TPU runtime writes, and aggregate
per-HLO-op device durations into pipeline stages via each op's ``source``
metadata (the Python file that emitted it).

The reference's analogue is the per-layer ``Tn::Profiler``
(include/Utils.h:24-49) that main() never attaches; this one is attached
for real — ``bench.py`` emits its table every round.

Trace anatomy (observed on TPU v5e / jax 0.9):
  - process "/device:TPU:0"; one tid holds whole-program XLA executions
    (name ``jit_<fn>(<hash>)``, dur = device time for that dispatch), a
    sibling tid holds per-HLO-op events with args ``source``
    ("file.py:line"), ``hlo_category``, ``model_flops``.
  - host-side pids carry runtime threads; ignored here.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import shutil
from typing import Callable, Dict, List, Optional, Tuple

# source-file basename -> pipeline stage (order matters: first match wins)
STAGE_BY_FILE = [
    ("voxelize.py", "voxelize"),
    ("scatter.py", "vfe"),
    ("vfe.py", "vfe"),
    ("windows.py", "window_set_partition"),
    ("encoder_pallas.py", "dsvt_blocks"),
    ("attention.py", "dsvt_blocks"),
    ("backbone3d.py", "dsvt_blocks"),
    ("bev.py", "bev_backbone2d"),
    ("backbone2d.py", "bev_backbone2d"),
    ("spatial.py", "bev_backbone2d"),
    ("head.py", "center_head"),
    ("postprocess.py", "decode_filter"),
    ("nms_pallas.py", "nms"),
    ("nms.py", "nms"),
]


class DeviceProfile:
    """Parsed result of one trace capture."""

    def __init__(self, program_ms: List[float], op_rows: List[dict],
                 n_iters: int):
        self.program_ms = program_ms      # device ms of each traced dispatch
        self.op_rows = op_rows            # aggregated per-op dicts
        self.n_iters = n_iters

    @property
    def device_ms_per_iter(self) -> float:
        if not self.program_ms:
            return 0.0
        return sum(self.program_ms) / len(self.program_ms)

    def stage_ms(self) -> Dict[str, float]:
        """Per-stage device ms per iteration (sums to ≈ device_ms_per_iter)."""
        out: Dict[str, float] = collections.defaultdict(float)
        for row in self.op_rows:
            out[row["stage"]] += row["ms"]
        return {k: round(v / max(self.n_iters, 1), 3)
                for k, v in sorted(out.items(), key=lambda kv: -kv[1])}

    def stage_table(self, peak_flops: Optional[float] = None) -> Dict[str, dict]:
        """Per-stage roofline: device ms, GFLOP (XLA ``model_flops`` summed
        over the stage's ops), and MFU vs ``peak_flops`` — per iteration.

        This is the adjudicator for any MFU claim: ``model_flops`` is XLA's
        own per-op cost analysis attached to the trace events, so the GFLOP
        column uses the compiler's count of the fused program, not a
        hand-derived one.  Note Pallas custom-calls report 0 model_flops
        (XLA cannot see inside them), so dsvt_blocks' GFLOP is a floor.
        """
        ms: Dict[str, float] = collections.defaultdict(float)
        fl: Dict[str, float] = collections.defaultdict(float)
        for row in self.op_rows:
            ms[row["stage"]] += row["ms"]
            fl[row["stage"]] += row.get("flops", 0.0)
        n = max(self.n_iters, 1)
        out = {}
        for k in sorted(ms, key=lambda k: -ms[k]):
            row = {"ms": round(ms[k] / n, 3),
                   "gflop": round(fl[k] / n / 1e9, 1)}
            if peak_flops and ms[k] > 0:
                row["mfu"] = round((fl[k] / n) / (ms[k] / n / 1e3)
                                   / peak_flops, 3)
            out[k] = row
        return out

    def stage_ops(self, stage: str, n: int = 8,
                  min_ms: float = 0.02) -> List[dict]:
        """Per-op rows for ONE stage, labeled by emitting source line.

        The flat top-op list prints opaque fused names (``fusion.157``);
        this keys each row by the op's ``source`` metadata (file:line of
        the dominant emitted op) so the sparse stages can be decomposed
        the way backbone2d's conv table was (VERDICT r4 task 5).  Pallas
        custom-calls carry no python source and keep their kernel name."""
        rows = [r for r in self.op_rows if r["stage"] == stage]
        agg: Dict[str, dict] = {}
        it = max(self.n_iters, 1)
        for r in rows:
            src = r.get("source", "")
            key = (os.path.basename(src.split(",")[0]) if src
                   else r["name"].split(".")[0])
            row = agg.setdefault(key, {"op": key, "ms": 0.0,
                                       "gflop": 0.0, "hlo": r["name"],
                                       "category": r["category"]})
            row["ms"] += r["ms"] / it
            row["gflop"] += r.get("flops", 0.0) / it / 1e9
        out = sorted(agg.values(), key=lambda r: -r["ms"])[:n]
        return [{**r, "ms": round(r["ms"], 3), "gflop": round(r["gflop"], 2)}
                for r in out if r["ms"] >= min_ms]

    def top_ops(self, n: int = 20) -> List[dict]:
        rows = sorted(self.op_rows, key=lambda r: -r["ms"])[:n]
        return [{**r, "ms": round(r["ms"] / max(self.n_iters, 1), 3)}
                for r in rows]

    def report(self, top: int = 20) -> str:
        lines = [f"device time: {self.device_ms_per_iter:.2f} ms/iter "
                 f"({len(self.program_ms)} dispatches traced)"]
        lines.append(f"{'stage':<24}{'ms/iter':>9}")
        for k, v in self.stage_ms().items():
            lines.append(f"{k:<24}{v:>9.3f}")
        lines.append("")
        lines.append(f"{'op':<44}{'ms/iter':>9}  {'category':<20}source")
        for r in self.top_ops(top):
            lines.append(f"{r['name'][:43]:<44}{r['ms']:>9.3f}  "
                         f"{r['category'][:19]:<20}{r['source']}")
        return "\n".join(lines)


def _stage_for(source: str, name: str, source_stack: str = "") -> str:
    """Attribute an op to a pipeline stage.

    Ops carry a ``source_stack`` (innermost frame first).  Attribution
    walks the stack from the OUTERMOST frame inward and takes the first
    stage match: detector.forward delegates each stage to exactly one
    top-level call, so the outermost matching frame names the stage even
    when the op was emitted by a helper defined elsewhere (e.g. the
    CenterHead convs call backbone2d._conv — innermost-frame attribution
    would bill them to the wrong stage)."""
    frames = [f for f in source_stack.splitlines() if f.strip()] or [source or ""]
    for frame in reversed(frames):
        base = os.path.basename(frame.split(":")[0])
        for fname, stage in STAGE_BY_FILE:
            if base == fname:
                return stage
    # Pallas kernels surface as custom-calls without python source
    low = name.lower()
    if "encoder" in low or "epilogue" in low:
        return "dsvt_blocks"
    if "iou" in low or "nms" in low:
        return "nms"
    return "other"


def parse_trace(logdir: str, n_iters: int,
                program_substr: str = "jit_") -> DeviceProfile:
    """Parse the newest vm.trace.json.gz under ``logdir``.

    Only op events that fall inside a main-program dispatch window are
    counted, so sync-readback helper programs (jit_ravel etc.) don't
    pollute the table.  The main program = the jit_* program with the
    largest total device time.
    """
    files = sorted(glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not files:
        raise FileNotFoundError(f"no trace.json.gz under {logdir}")
    with gzip.open(files[-1]) as f:
        data = json.load(f)
    events = data["traceEvents"]

    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev_pids = {p for p, n in pid_names.items() if "/device:" in n}

    # whole-program dispatches per program name
    programs: Dict[str, List[Tuple[float, float]]] = collections.defaultdict(list)
    for e in events:
        if (e.get("ph") == "X" and e["pid"] in dev_pids
                and program_substr in e.get("name", "")
                and "long_name" not in e.get("args", {})):
            programs[e["name"]].append((e["ts"], e["dur"]))
    if not programs:
        raise ValueError("no device program dispatches in trace")
    main_name = max(programs, key=lambda k: sum(d for _, d in programs[k]))
    windows = programs[main_name]
    program_ms = [d / 1e3 for _, d in windows]
    spans = sorted((ts, ts + d) for ts, d in windows)

    def in_main(ts: float) -> bool:
        import bisect
        i = bisect.bisect_right(spans, (ts, float("inf"))) - 1
        return i >= 0 and spans[i][0] <= ts <= spans[i][1]

    # per-op events aggregated by op name
    agg: Dict[str, dict] = {}
    for e in events:
        args = e.get("args", {})
        if (e.get("ph") != "X" or e["pid"] not in dev_pids
                or "long_name" not in args or not in_main(e["ts"])):
            continue
        name = e["name"]
        row = agg.setdefault(name, {
            "name": name, "ms": 0.0, "calls": 0,
            "category": args.get("hlo_category", ""),
            "source": args.get("source", ""),
            "flops": 0.0,
            # the HLO text incl. operand shapes/layouts — the first thing
            # to check when an op is slow (layout demotions show up here)
            "long_name": args.get("long_name", "")[:600],
        })
        row["ms"] += e["dur"] / 1e3
        row["calls"] += 1
        row.setdefault("source_stack", args.get("source_stack", ""))
        try:
            row["flops"] += float(args.get("model_flops", 0) or 0)
        except (TypeError, ValueError):
            pass
    rows = list(agg.values())
    for r in rows:
        r["stage"] = _stage_for(r["source"], r["name"],
                                r.pop("source_stack", ""))
    return DeviceProfile(program_ms, rows, n_iters)


def capture(fn: Callable, args: tuple, iters: int = 10,
            logdir: str = "/tmp/dsvt_device_trace",
            warmup: bool = True) -> DeviceProfile:
    """Run ``fn(*args)`` ``iters`` times under the JAX profiler and parse.

    ``fn`` should be jitted (or jit-cached); completion is forced via a
    host readback of one output scalar — block_until_ready alone returns
    optimistically on the tunneled axon runtime.
    """
    import jax
    import numpy as np

    def _sync(res):
        leaf = jax.tree.leaves(res)[0]
        np.asarray(jax.numpy.ravel(leaf)[0])

    if warmup:
        _sync(fn(*args))
    shutil.rmtree(logdir, ignore_errors=True)
    jax.profiler.start_trace(logdir)
    try:
        res = None
        for _ in range(iters):
            res = fn(*args)
        _sync(res)
    finally:
        jax.profiler.stop_trace()
    return parse_trace(logdir, iters)
