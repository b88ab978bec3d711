"""Per-stage profiling.

The reference ships an IProfiler shim it never attaches (include/Utils.h:24-49)
and times frames with clock() mislabeled as ms (dsvt-ai-trt.cpp:1918,1956).
Here: wall-clock stage timers with explicit device sync, plus a hook into
jax.profiler for full XLA traces.
"""

from __future__ import annotations

import contextlib
import functools
import time
from typing import Dict, List

import jax


class StageTimer:
    """Accumulates per-stage wall times with device synchronization."""

    def __init__(self):
        self.times: Dict[str, List[float]] = {}
        self.flops: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync_value=None):
        t0 = time.perf_counter()
        yield
        if sync_value is not None:
            jax.block_until_ready(sync_value)
        self.times.setdefault(name, []).append(time.perf_counter() - t0)

    def record(self, name: str, seconds: float) -> None:
        self.times.setdefault(name, []).append(seconds)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, vals in self.times.items():
            out[name] = {
                "mean_ms": sum(vals) / len(vals) * 1e3,
                "min_ms": min(vals) * 1e3,
                "max_ms": max(vals) * 1e3,
                "calls": len(vals),
            }
        return out

    def report(self) -> str:
        lines = [f"{'stage':<28}{'mean ms':>10}{'min ms':>10}{'max ms':>10}{'calls':>7}"]
        for name, s in self.summary().items():
            lines.append(f"{name:<28}{s['mean_ms']:>10.2f}{s['min_ms']:>10.2f}"
                         f"{s['max_ms']:>10.2f}{s['calls']:>7}")
        return "\n".join(lines)


# bf16 peak matmul throughput per chip, FLOP/s (public spec sheets); fp32 on
# TPU runs through the same MXU at ~1/2 (v4/v5) via fp32 accumulation passes.
_PEAK_BF16 = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def device_peak_flops(precision: str = "bf16", device=None) -> float:
    """Best-effort peak FLOP/s for the attached device (0.0 if unknown)."""
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "")
    for name, peak in _PEAK_BF16.items():
        if kind.startswith(name) or name.lower() in kind.lower():
            return peak if precision != "fp32" else peak / 2
    return 0.0


def program_flops(fn, *args) -> float:
    """Total FLOPs of the compiled program via XLA's cost analysis.

    Returns 0.0 when the backend doesn't expose cost analysis (e.g. some
    plugin runtimes) — loudly, so an MFU of null in a bench artifact is
    traceable to the logged cause rather than read as "no regression"."""
    import logging
    try:
        compiled = jax.jit(fn).lower(*args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        flops = float(ca.get("flops", 0.0))
        if not flops:
            logging.getLogger(__name__).warning(
                "XLA cost analysis returned no 'flops' key (keys: %s); "
                "MFU will be omitted", sorted(ca)[:10])
        return flops
    except Exception as exc:  # pragma: no cover - backend-specific
        logging.getLogger(__name__).warning(
            "XLA cost analysis unavailable (%s: %s); MFU will be omitted",
            type(exc).__name__, exc)
        return 0.0


@contextlib.contextmanager
def xla_trace(log_dir: str = "/tmp/dsvt_tpu_trace"):
    """Capture a full XLA profile viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def _sync(tree) -> None:
    """Force real completion by reading back one scalar.

    jax.block_until_ready can return optimistically on tunneled platforms
    (axon); a host readback of a 4-byte checksum cannot.
    """
    import numpy as np

    leaves = jax.tree.leaves(tree)
    np.asarray(jax.numpy.ravel(leaves[0])[0])


def profile_stages(params, points, num_points, cfg, iters: int = 10) -> StageTimer:
    """Time each pipeline stage separately (each stage jitted on its own).

    SUPERSEDED by ``runtime/trace.py`` for any quotable number: each stage
    here syncs via a host readback of its own output, so on the tunneled
    axon runtime every entry carries a ~28 ms RTT, and inter-stage fusion
    is lost (the sum exceeds the fused end-to-end time).  Kept as a
    debugging aid for isolating one stage under a debugger; for per-stage
    device time use ``trace.capture`` (bench.py emits its table).  The
    per-stage FLOPs from XLA cost analysis (``timer.flops``) remain valid.
    """
    from ..ops.voxelize import voxelize
    from ..ops.windows import window_partition, set_partition
    from ..ops.bev import map_to_bev
    from ..ops.postprocess import decode_and_filter
    from ..ops import nms as nms_ops
    from ..model.vfe import vfe_forward
    from ..model.backbone3d import backbone3d_forward
    from ..model.backbone2d import backbone2d_forward
    from ..model.head import head_forward

    timer = StageTimer()
    vox_fn = jax.jit(functools.partial(voxelize, cfg=cfg))
    vfe_fn = jax.jit(lambda pil: vfe_forward(pil, params["vfe"],
                                             cfg.max_pillars, cfg.precision))

    def parts_fn(coords, valid):
        out = []
        for spec in cfg.window_specs:
            wp = window_partition(coords, valid, spec, cfg)
            out.append((wp, set_partition(wp, valid, spec, cfg)))
        return out

    parts_jit = jax.jit(parts_fn)
    b3d_fn = jax.jit(lambda feats, wps, sps: backbone3d_forward(
        feats, wps, sps, params, cfg, cfg.precision))
    bev_fn = jax.jit(lambda feats, coords, valid: backbone2d_forward(
        map_to_bev(feats, coords, valid, (cfg.grid_size[1], cfg.grid_size[0])),
        params["backbone2d"], cfg.precision))
    # lazy=True + head_params: profile the same head/decode split the
    # deployed forward runs (model/detector.py), not the full-map conv path
    head_fn = jax.jit(lambda bev: head_forward(bev, params["head"],
                                               cfg.precision, lazy=True))
    post_fn = jax.jit(lambda hm: decode_and_filter(
        hm, cfg, head_params=params["head"]))
    nms_fn = jax.jit(lambda b, c: nms_ops.nms(b, c, cfg.nms_threshold))

    stages = []

    def run_all():
        vox = vox_fn(points, num_points)
        stages_out = [("voxelize", vox, vox.point_feats)]
        feats = vfe_fn(vox)
        stages_out.append(("vfe", feats, feats))
        parts = parts_jit(vox.coords, vox.pillar_valid)
        stages_out.append(("window_set_partition", parts, parts[0][1].inds))
        d3 = b3d_fn(feats, [p[0] for p in parts], [p[1] for p in parts])
        stages_out.append(("dsvt_blocks", d3, d3))
        bev = bev_fn(d3, vox.coords, vox.pillar_valid)
        stages_out.append(("bev_backbone2d", bev, bev))
        hm = head_fn(bev)
        stages_out.append(("center_head", hm, hm["hm"]))
        dets = post_fn(hm)
        stages_out.append(("decode_filter", dets, dets.boxes))
        out = nms_fn(dets.boxes, dets.count)
        stages_out.append(("nms", out, out[0]))
        return stages_out

    # warm/compile, then force completion of everything once
    for name, _res, sync_target in run_all():
        _sync(sync_target)

    # timed: re-dispatch each stage and sync on its own output
    vox = vox_fn(points, num_points)
    feats = vfe_fn(vox)
    parts = parts_jit(vox.coords, vox.pillar_valid)
    d3 = b3d_fn(feats, [p[0] for p in parts], [p[1] for p in parts])
    dets = None
    for _ in range(iters):
        with timer.stage("voxelize"):
            vox = vox_fn(points, num_points)
            _sync(vox.point_feats)
        with timer.stage("vfe"):
            feats = vfe_fn(vox)
            _sync(feats)
        with timer.stage("window_set_partition"):
            parts = parts_jit(vox.coords, vox.pillar_valid)
            _sync(parts[-1][1].inds)
        with timer.stage("dsvt_blocks"):
            d3 = b3d_fn(feats, [p[0] for p in parts], [p[1] for p in parts])
            _sync(d3)
        with timer.stage("bev_backbone2d"):
            bev = bev_fn(d3, vox.coords, vox.pillar_valid)
            _sync(bev)
        with timer.stage("center_head"):
            hm = head_fn(bev)
            _sync(hm["hm"])
        with timer.stage("decode_filter"):
            dets = post_fn(hm)
            _sync(dets.boxes)
        with timer.stage("nms"):
            out = nms_fn(dets.boxes, dets.count)
            _sync(out[0])

    # per-stage FLOPs via XLA cost analysis (0.0 where unavailable)
    timer.flops = {
        "voxelize": program_flops(vox_fn, points, num_points),
        "vfe": program_flops(vfe_fn, vox),
        "window_set_partition": program_flops(parts_jit, vox.coords,
                                              vox.pillar_valid),
        "dsvt_blocks": program_flops(b3d_fn, feats, [p[0] for p in parts],
                                     [p[1] for p in parts]),
        "bev_backbone2d": program_flops(bev_fn, d3, vox.coords,
                                        vox.pillar_valid),
        "center_head": program_flops(head_fn, bev),
        "decode_filter": program_flops(post_fn, hm),
        "nms": program_flops(nms_fn, dets.boxes, dets.count),
    }
    return timer
