"""End-to-end training proof on the real chip (VERDICT r3 task 4 / r4 task 1).

Trains the FULL default config from random init on planted scenes —
synthetic ground clutter AND composites onto the bundled real LiDAR
frames (data.real_background_scene, VERDICT r4 task 7) — then proves the
capability chain the reference points upstream for (README.md:74-80):

  train N steps (batch 2, remat+sequential-frames on TPU)
    -> eval planted-box recovery on HELD-OUT scenes (eval.coverage,
       recall/precision at IoU 0.5), on BOTH scene families
    -> per-miss diagnosis (class / size / best-IoU / heading of nearest)
    -> export .wts (weights.unfold_params + save_wts)
    -> reload the .wts through the normal checkpoint path
    -> re-eval, assert identical recall

Writes TRAIN_r05.json with the loss-curve endpoints, both evals, the
score-threshold sweep, the miss table, and the wedge-cue probe
measurement (tools/heading_probe.py).

    PYTHONPATH=. python tools/train_run.py [--steps 400] [--out TRAIN_r05.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def eval_recovery(params, cfg, n_scenes: int, seed: int, min_score: float,
                  scene_fn=None, sweep=(), **scene_kw):
    """Planted-box recovery on held-out scenes; recall/precision vs GT.

    scene_fn(rng, cfg, **scene_kw) -> (points, count, gt); defaults to
    data.synthetic_scene.  ``sweep`` adds a recall/precision curve over
    alternative score thresholds from the SAME raw detections.  The miss
    table records, for every GT box the gate missed, what the nearest
    prediction looked like — the round-4 artifact had a 0.33-recall scene
    with no way to tell WHAT was dropped."""
    import jax  # noqa: F401  (device backend selected by caller's env)
    from dsvt_ai_trt_tpu.data import synthetic_scene
    from dsvt_ai_trt_tpu.eval import coverage, _bev_iou
    from dsvt_ai_trt_tpu.model.detector import forward_jit

    scene_fn = scene_fn or synthetic_scene
    rng = np.random.default_rng(seed)
    n_gt = n_hit = n_pred = n_true = 0
    per_scene, head_errs, misses = [], [], []
    sweep_counts = {t: [0, 0, 0, 0] for t in sweep}  # gt, hit, pred, true
    for si in range(n_scenes):
        pts, n, gt = scene_fn(rng, cfg, **scene_kw)
        dets = forward_jit(params, pts, n, cfg, True)
        raw = np.asarray(dets.boxes)[: int(dets.count)]
        boxes = raw[raw[:, 8] >= min_score]
        r = coverage(gt, boxes, iou_threshold=0.5)       # recall side
        p = coverage(boxes, gt, iou_threshold=0.5)       # precision side
        n_gt += len(gt)
        n_hit += round(r["coverage"] * len(gt))
        n_pred += len(boxes)
        n_true += round(p["coverage"] * len(boxes))
        per_scene.append({"gt": len(gt), "recall": r["coverage"],
                          "pred": len(boxes), "precision": p["coverage"]})
        for t in sweep:
            bt = raw[raw[:, 8] >= t]
            rt = coverage(gt, bt, iou_threshold=0.5)
            pt = coverage(bt, gt, iou_threshold=0.5)
            sweep_counts[t][0] += len(gt)
            sweep_counts[t][1] += round(rt["coverage"] * len(gt))
            sweep_counts[t][2] += len(bt)
            sweep_counts[t][3] += round(pt["coverage"] * len(bt))
        # heading diagnostic on center-matched pairs (rot is the detection
        # quantity that converges last; rotated IoU@0.5 for an aspect-2.4
        # box forgives only ~15-20 deg of heading error) + miss table
        for g in gt:
            best_iou, nearest, nd = 0.0, None, np.inf
            if len(boxes):
                d = np.hypot(boxes[:, 0] - g[0], boxes[:, 1] - g[1])
                j = int(d.argmin())
                nearest, nd = boxes[j], float(d[j])
                same_cls = boxes[boxes[:, 7] == g[7]]
                best_iou = max((_bev_iou(g, b) for b in same_cls),
                               default=0.0)
                if nd < 1.5:
                    e = ((nearest[6] - g[6] + np.pi) % (2 * np.pi)) - np.pi
                    head_errs.append(abs(float(e)))
            if best_iou < 0.5:       # the gate missed this GT: diagnose it
                row = {"scene": si, "cls": int(g[7]),
                       "l": round(float(g[3]), 2),
                       "best_iou_same_cls": round(float(best_iou), 3),
                       "nearest_center_m": round(nd, 2)}
                if nearest is not None and nd < 1.5:
                    e = ((nearest[6] - g[6] + np.pi) % (2 * np.pi)) - np.pi
                    row.update({
                        "nearest_cls": int(nearest[7]),
                        "nearest_score": round(float(nearest[8]), 3),
                        "nearest_heading_err_deg": round(
                            abs(float(np.degrees(e))), 1)})
                misses.append(row)
    he = np.asarray(head_errs)
    # mod-pi stats are the IoU-relevant ones: a pi-flipped heading gives the
    # IDENTICAL box (centrally symmetric); direction (the raw stat) is only
    # resolvable from the wedge-roof cue, whose signal strength is measured
    # by tools/heading_probe.py and whose learning is driven by the 1-cos
    # direction term (parallel/training.py detection_loss)
    he_pi = np.minimum(he, np.pi - he) if len(he) else he
    return {"recall": n_hit / max(n_gt, 1),
            "precision": n_true / max(n_pred, 1),
            "n_gt": n_gt, "n_pred": n_pred, "scenes": per_scene,
            "misses": misses,
            "score_sweep": {str(t): {
                "recall": c[1] / max(c[0], 1), "precision": c[3] / max(c[2], 1)}
                for t, c in sweep_counts.items()},
            "heading_err_deg_median": round(float(np.degrees(
                np.median(he))), 2) if len(he) else None,
            "heading_frac_lt_15deg": round(float(
                (he < np.pi / 12).mean()), 3) if len(he) else None,
            "heading_modpi_deg_median": round(float(np.degrees(
                np.median(he_pi))), 2) if len(he) else None,
            "heading_modpi_frac_lt_15deg": round(float(
                (he_pi < np.pi / 12).mean()), 3) if len(he) else None}


def load_real_frames(cfg, data_dir: str):
    """The distinct bundled real clouds (3 among the 10 .bin files)."""
    from dsvt_ai_trt_tpu.io.pointcloud import frame_paths, load_bin

    distinct, seen = [], set()
    for path in frame_paths(data_dir):
        with open(path, "rb") as f:
            digest = hash(f.read())
        if digest not in seen:
            seen.add(digest)
            buf, n = load_bin(path, cfg.max_points)
            distinct.append(np.asarray(buf)[: int(n)])
    return distinct


def real_scene_fn(frames):
    """scene_fn closure cycling planted-on-real composites over `frames`."""
    from dsvt_ai_trt_tpu.data import real_background_scene

    state = {"i": 0}

    def fn(rng, cfg, **kw):
        base = frames[state["i"] % len(frames)]
        state["i"] += 1
        return real_background_scene(rng, cfg, base, **kw)

    return fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval-scenes", type=int, default=8)
    ap.add_argument("--min-score", type=float, default=0.3)
    ap.add_argument("--real-every", type=int, default=4,
                    help="every Nth train batch is planted-on-real (0=off)")
    ap.add_argument("--data", default=os.environ.get(
        "DSVT_BENCH_DATA", "/root/reference/data/bin"))
    ap.add_argument("--out", default="TRAIN_r05.json")
    ap.add_argument("--init-wts", default=None,
                    help="resume from a saved .wts instead of random init "
                         "(continue a run, or --steps 0 for eval-only)")
    ap.add_argument("--dir-weight", type=float, default=0.25,
                    help="weight of the 1-cos direction term")
    ap.add_argument("--aux-weight", type=float, default=0.25,
                    help="weight of the double-angle aux term (lower it in "
                         "a finishing phase: its pi-periodic pull opposes "
                         "the direction term past 90 deg)")
    ap.add_argument("--wts", default="/tmp/dsvt_trained.wts")
    ap.add_argument("--log-every", type=int, default=10)
    args = ap.parse_args()

    import jax
    import optax
    from dsvt_ai_trt_tpu.config import DEFAULT_CONFIG
    from dsvt_ai_trt_tpu import weights
    from dsvt_ai_trt_tpu.data import synthetic_batch, real_background_scene
    from dsvt_ai_trt_tpu.parallel.training import Targets, make_train_step
    from dsvt_ai_trt_tpu.data import assign_targets
    from dsvt_ai_trt_tpu.runtime.compile import enable_persistent_cache
    from heading_probe import probe_cue

    enable_persistent_cache()
    cfg = DEFAULT_CONFIG
    if args.init_wts:
        params = weights.prepare_params(weights.load_wts(args.init_wts), cfg)
        print(f"resumed params from {args.init_wts}", flush=True)
    else:
        params = weights.random_params(cfg, seed=args.seed)

    # the wedge-cue measurement that justifies expecting raw DIRECTION to
    # be learnable at all (VERDICT r4: "measure the feature, don't assume")
    cue = probe_cue(cfg, n_boxes=300)
    print(f"cue probe: {json.dumps(cue)}", flush=True)

    real_frames = []
    if args.real_every and os.path.isdir(args.data):
        real_frames = load_real_frames(cfg, args.data)
        print(f"loaded {len(real_frames)} distinct real frames", flush=True)

    def real_batch(rng, batch):
        import jax.numpy as jnp
        pts, ns, hms, regs, masks = [], [], [], [], []
        for b in range(batch):
            base = real_frames[int(rng.integers(len(real_frames)))]
            buf, n, gt = real_background_scene(rng, cfg, base)
            hm, reg, mask = assign_targets(gt, cfg)
            pts.append(buf)
            ns.append(n)
            hms.append(hm)
            regs.append(reg)
            masks.append(mask)
        return (jnp.asarray(np.stack(pts)), jnp.asarray(np.stack(ns)),
                Targets(heatmap=jnp.asarray(np.stack(hms)),
                        reg=jnp.asarray(np.stack(regs)),
                        mask=jnp.asarray(np.stack(masks))))

    # warmup-cosine: the fixed adamw(1e-4) default works but is slow to
    # localize from random init in a few hundred steps
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps=min(50, max(args.steps // 4, 1)),
        decay_steps=max(args.steps, 1))
    optimizer, train_step = make_train_step(
        cfg, optax.chain(optax.clip_by_global_norm(10.0),
                         optax.adamw(sched)),
        dir_weight=args.dir_weight, aux_weight=args.aux_weight)
    opt_state = optimizer.init(params)
    train_jit = jax.jit(train_step)

    rng = np.random.default_rng(args.seed + 1)
    losses = []
    t0 = time.time()
    for step in range(args.steps):
        if real_frames and args.real_every and (step % args.real_every == 3):
            pts, ns, targets = real_batch(rng, args.batch)
        else:
            pts, ns, targets = synthetic_batch(rng, cfg, args.batch)
        params, opt_state, loss = train_jit(params, opt_state, pts, ns,
                                            targets)
        if step % args.log_every == 0 or step == args.steps - 1:
            loss = float(loss)          # sync point
            losses.append({"step": step, "loss": round(loss, 4)})
            print(f"step {step} loss {loss:.4f} "
                  f"({(time.time() - t0):.0f}s)", flush=True)
    train_s = time.time() - t0

    # export FIRST so a crash in eval cannot lose the trained weights
    raw = weights.unfold_params(jax.device_get(params), cfg)
    weights.save_wts(raw, args.wts)
    print(f"trained weights -> {args.wts}", flush=True)

    sweep = (0.2, 0.25, 0.35, 0.4)
    print("eval: trained params on held-out synthetic scenes", flush=True)
    ev = eval_recovery(params, cfg, args.eval_scenes, seed=9999,
                       min_score=args.min_score, sweep=sweep)
    print(json.dumps({k: ev[k] for k in
                      ("recall", "precision", "n_gt", "n_pred",
                       "heading_err_deg_median", "heading_frac_lt_15deg",
                       "heading_modpi_deg_median",
                       "heading_modpi_frac_lt_15deg", "score_sweep")}),
          flush=True)
    if ev["misses"]:
        print("misses:", json.dumps(ev["misses"]), flush=True)

    ev_real = None
    if real_frames:
        print("eval: held-out planted-on-real scenes", flush=True)
        ev_real = eval_recovery(params, cfg, args.eval_scenes, seed=31337,
                                min_score=args.min_score,
                                scene_fn=real_scene_fn(real_frames),
                                sweep=sweep)
        print(json.dumps({k: ev_real[k] for k in
                          ("recall", "precision", "n_gt", "n_pred")}),
              flush=True)
        if ev_real["misses"]:
            print("real misses:", json.dumps(ev_real["misses"]), flush=True)

    # reload the .wts through the normal checkpoint path -> re-eval
    # (the reference's gen_wts round trip)
    reloaded = weights.prepare_params(weights.load_wts(args.wts), cfg)
    ev2 = eval_recovery(reloaded, cfg, args.eval_scenes, seed=9999,
                        min_score=args.min_score)
    print(json.dumps({"reloaded_recall": ev2["recall"],
                      "reloaded_precision": ev2["precision"]}), flush=True)

    def block(e):
        return {k: e[k] for k in ("recall", "precision", "n_gt", "n_pred",
                                  "heading_err_deg_median",
                                  "heading_frac_lt_15deg",
                                  "heading_modpi_deg_median",
                                  "heading_modpi_frac_lt_15deg",
                                  "score_sweep", "misses")}

    ok = ev["recall"] >= 0.8 and abs(ev2["recall"] - ev["recall"]) < 1e-9
    ok_real = (ev_real is None) or ev_real["recall"] >= 0.7
    result = {
        "steps": args.steps, "batch": args.batch, "lr": args.lr,
        "real_every": args.real_every if real_frames else 0,
        "train_seconds": round(train_s, 1),
        "backend": jax.default_backend(),
        "device": jax.devices()[0].device_kind,
        "cue_probe": cue,
        "init_wts": args.init_wts,
        "dir_weight": args.dir_weight,
        "aux_weight": args.aux_weight,
        "loss_first": losses[0]["loss"] if losses else None,
        "loss_last": losses[-1]["loss"] if losses else None,
        "loss_curve": losses,
        "eval": block(ev),
        "eval_scenes": ev["scenes"],
        "real_background": block(ev_real) if ev_real else None,
        "wts_roundtrip": {"recall": ev2["recall"],
                          "precision": ev2["precision"],
                          "matches_trained": ev2["recall"] == ev["recall"]},
        "pass_recall_0.8": ok,
        "pass_real_recall_0.7": ok_real if ev_real else None,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"-> {args.out}  pass={ok and ok_real}")
    sys.exit(0 if (ok and ok_real) else 1)


if __name__ == "__main__":
    main()
