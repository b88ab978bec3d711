"""Heading-direction diagnostics (VERDICT r4 task 1).

Two questions the round-4 run left open, answered with measurements:

1. ``probe``: does the wedge-roof cue (data._box_surface_points) survive
   per-pillar max-z pooling at the 0.32 m pillar grid — i.e. is heading
   DIRECTION identifiable from what the VFE's scatter-max actually sees?
   An oracle that knows the box axis fits a line to (along-axis pillar
   coordinate, pillar max-z) and predicts direction from the slope sign.
   High accuracy = the cue carries signal and a failure to learn it is a
   LOSS/OPTIMIZATION problem, not a data problem.

2. ``ab``: tiny-config train A/B over the direction-loss weight
   (parallel/training.py detection_loss dir_weight).  The round-4 run
   proved the aux double-angle term creates a local minimum at the
   pi-flipped rot vector (raw heading median 154.8 deg); the 1-cos
   direction term turns that mode into a saddle.  This measures the
   escape actually happening.

    PYTHONPATH=. python tools/heading_probe.py probe [--boxes 300]
    JAX_PLATFORMS=cpu PYTHONPATH=. python tools/heading_probe.py ab \
        [--steps 500] [--wdirs 0.0,0.5]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dsvt_ai_trt_tpu.config import DEFAULT_CONFIG, DSVTConfig, WindowSpec  # noqa: E402
from dsvt_ai_trt_tpu.data import _box_surface_points  # noqa: E402


def probe_cue(cfg: DSVTConfig, n_boxes: int = 300, pts_per_obj: int = 150,
              seed: int = 0) -> dict:
    """Linear-probe accuracy of heading DIRECTION from per-pillar max-z.

    For each planted box: sample its surface points exactly as the train
    data does, pool max-z per 0.32 m pillar (the z statistic the VFE's
    scatter-max forwards), project occupied pillar centers onto the KNOWN
    box axis, and predict direction = sign of the (along, max_z) slope.
    The wedge roof rises toward +x of the box, so a positive slope means
    the heading points along +axis."""
    rng = np.random.default_rng(seed)
    vx, vy = cfg.voxel_size[0], cfg.voxel_size[1]
    correct = 0
    slopes = []
    pillars_per_box = []
    for _ in range(n_boxes):
        cls = int(rng.integers(0, cfg.num_classes))
        base_l = 2.6 * 1.17 ** cls
        base = np.array([base_l * 0.42, base_l, 1.35 * 1.05 ** cls])
        dims = base * rng.uniform(0.93, 1.07, 3)
        heading = float(rng.uniform(-np.pi, np.pi))
        box = np.array([0.0, 0.0, -1.0, dims[1], dims[0], dims[2],
                        heading, cls], np.float32)
        pts = _box_surface_points(rng, box, pts_per_obj)
        # pillar max-z pooling on the real grid pitch
        ix = np.floor(pts[:, 0] / vx).astype(np.int64)
        iy = np.floor(pts[:, 1] / vy).astype(np.int64)
        key = (ix - ix.min()) * 100000 + (iy - iy.min())
        order = np.argsort(key, kind="stable")
        key_s, z_s = key[order], pts[order, 2]
        heads = np.concatenate([[True], key_s[1:] != key_s[:-1]])
        seg = np.cumsum(heads) - 1
        maxz = np.full(seg[-1] + 1, -np.inf, np.float32)
        np.maximum.at(maxz, seg, z_s)
        # occupied pillar centers, projected on the box AXIS (mod-pi
        # knowledge the network demonstrably has; direction is the unknown)
        cx = (ix[order][heads] + 0.5) * vx
        cy = (iy[order][heads] + 0.5) * vy
        axis = heading % np.pi
        ux, uy = np.cos(axis), np.sin(axis)
        along = cx * ux + cy * uy
        slope = float(np.polyfit(along, maxz, 1)[0]) if len(along) > 2 else 0.0
        # heading points along +axis iff cos(heading - axis) > 0
        true_sign = 1.0 if np.cos(heading - axis) > 0 else -1.0
        correct += (np.sign(slope) == true_sign)
        slopes.append(abs(slope))
        pillars_per_box.append(len(along))
    return {"n_boxes": n_boxes, "pts_per_obj": pts_per_obj,
            "accuracy": round(correct / n_boxes, 4),
            "median_abs_slope_m_per_m": round(float(np.median(slopes)), 4),
            "median_pillars_per_box": int(np.median(pillars_per_box))}


def tiny_cfg() -> DSVTConfig:
    """Same shape as tests/conftest.tiny_config: full structure, tiny dims."""
    return DSVTConfig(
        max_points=2048, max_kept_points=1536, max_pillars=512,
        max_points_per_pillar=8, voxel_size=(0.32, 0.32, 8.0),
        pc_range_min=(-7.68, -7.68, -5.0), pc_range_max=(7.68, 7.68, 3.0),
        grid_size=(48, 48, 1), pfn_channels=(16, 32), sparse_shape=(48, 48, 1),
        window_specs=(WindowSpec(shape=(12, 12, 1), shift=(0, 0, 0)),
                      WindowSpec(shape=(24, 24, 1), shift=(6, 6, 0))),
        max_voxels_per_window=576, max_sets=128, set_size=12, num_blocks=2,
        num_heads=4, d_model=32, ffn_dim=64, num_classes=3, top_k=64)


def run_ab(steps: int, wdirs, seed: int = 0, eval_scenes: int = 12) -> dict:
    import jax
    import optax
    from dsvt_ai_trt_tpu import weights
    from dsvt_ai_trt_tpu.data import synthetic_batch
    from dsvt_ai_trt_tpu.parallel.training import make_train_step
    from train_run import eval_recovery

    cfg = dataclasses.replace(tiny_cfg())
    out = {}
    for w in wdirs:
        params = weights.random_params(cfg, seed=seed)
        sched = optax.warmup_cosine_decay_schedule(
            0.0, 3e-4, warmup_steps=min(50, steps // 4), decay_steps=steps)
        optimizer, train_step = make_train_step(
            cfg, optax.chain(optax.clip_by_global_norm(10.0),
                             optax.adamw(sched)), dir_weight=w)
        opt_state = optimizer.init(params)
        train_jit = jax.jit(train_step)
        rng = np.random.default_rng(seed + 1)
        t0 = time.time()
        loss = None
        for step in range(steps):
            pts, ns, targets = synthetic_batch(rng, cfg, 2, n_objects=3,
                                               n_ground=500, pts_per_obj=80)
            params, opt_state, loss = train_jit(params, opt_state, pts, ns,
                                                targets)
        ev = eval_recovery(params, cfg, eval_scenes, seed=4242,
                           min_score=0.2, n_objects=3, n_ground=500,
                           pts_per_obj=80)
        out[f"wdir_{w}"] = {
            "loss_last": round(float(loss), 4),
            "seconds": round(time.time() - t0, 1),
            "recall": ev["recall"],
            "heading_err_deg_median": ev["heading_err_deg_median"],
            "heading_frac_lt_15deg": ev["heading_frac_lt_15deg"],
            "heading_modpi_deg_median": ev["heading_modpi_deg_median"],
            "heading_modpi_frac_lt_15deg": ev["heading_modpi_frac_lt_15deg"]}
        print(f"w_dir={w}: {json.dumps(out[f'wdir_{w}'])}", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["probe", "ab"])
    ap.add_argument("--boxes", type=int, default=300)
    ap.add_argument("--pts", type=int, default=150)
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--wdirs", default="0.0,0.5")
    args = ap.parse_args()
    if args.mode == "probe":
        print(json.dumps(probe_cue(DEFAULT_CONFIG, args.boxes, args.pts)))
    else:
        wdirs = [float(w) for w in args.wdirs.split(",")]
        print(json.dumps(run_ab(args.steps, wdirs)))


if __name__ == "__main__":
    main()
