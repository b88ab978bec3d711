"""Training step for the DSVT detector (new capability vs the reference).

The reference is inference-only; its training story is "retrain in the
upstream DSVT repo" (README.md:74-80).  Because this build keeps the exact
``module.*`` parameter contract, a model fine-tuned here exports straight
back to the reference's .wts format.

Loss follows CenterPoint: penalty-reduced focal loss on the class heatmap
plus L1 on the regression maps at annotated centers.  The full pipeline
(voxelize -> DSVT -> BEV CNN -> head) is differentiable end-to-end: gather
indices from the sort-based partitions are integers, so gradients flow
through the gathered values exactly like the torch original.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import DSVTConfig
from ..model.detector import forward_debug


class Targets(NamedTuple):
    """Dense CenterPoint targets for one frame.

    heatmap:  [H, W, ncls] gaussians in [0, 1].
    reg:      [H, W, 8] = (center 2, center_z 1, dim(log) 3, rot 2).
    mask:     [H, W] 1.0 at annotated centers.
    """

    heatmap: jax.Array
    reg: jax.Array
    mask: jax.Array


def focal_loss(pred_logits: jax.Array, target: jax.Array,
               alpha: float = 2.0, beta: float = 4.0) -> jax.Array:
    """Penalty-reduced pixelwise focal loss (CornerNet/CenterPoint)."""
    pred = jax.nn.sigmoid(pred_logits)
    pred = jnp.clip(pred, 1e-6, 1 - 1e-6)
    pos = (target >= 0.999).astype(pred.dtype)
    pos_loss = -jnp.log(pred) * (1 - pred) ** alpha * pos
    neg_loss = (-jnp.log(1 - pred) * pred ** alpha
                * (1 - target) ** beta * (1 - pos))
    num_pos = jnp.maximum(jnp.sum(pos), 1.0)
    return (jnp.sum(pos_loss) + jnp.sum(neg_loss)) / num_pos


def detection_loss(params, points, num_points, targets: Targets,
                   cfg: DSVTConfig, dir_weight: float = 0.25,
                   aux_weight: float = 0.25) -> jax.Array:
    out = forward_debug(params, points, num_points, cfg).head_out
    hm_loss = focal_loss(out["hm"], targets.heatmap)
    reg_pred = jnp.concatenate(
        [out["center"], out["center_z"], out["dim"], out["rot"]], axis=-1)
    m = targets.mask[..., None]
    reg_loss = jnp.sum(jnp.abs(reg_pred - targets.reg) * m) / jnp.maximum(
        jnp.sum(m) * reg_pred.shape[-1], 1.0)
    # double-angle auxiliary on the rot vector: L1((c^2-s^2, 2cs) vs
    # (cos 2t, sin 2t)).  The primary L1 on (cos t, sin t) is BIMODAL under
    # the pi-ambiguity every front-back-near-symmetric object carries — when
    # features resolve orientation mod pi before direction, its optimum is
    # the ZERO vector, and training collapses |rot| toward 0 with arbitrary
    # decoded headings (measured: 2000 full-config steps ended at median
    # heading error 63-73 deg, |rot| ~ 0.2 ~ init).  The doubled angle maps
    # both modes to the SAME target, so mod-pi knowledge earns |rot| -> 1 on
    # the correct axis; direction then rides the primary term where the
    # wedge-roof cue (data.py) resolves it — and rotated IoU (the eval
    # metric, like every box-overlap metric) is blind to a pi flip anyway.
    # Tiny-config A/B, 500 steps: mod-pi median 57.2 -> 11.9 deg,
    # frac<15deg 0.208 -> 0.708, |v| 0.19 -> 0.66.
    c, s = out["rot"][..., 0], out["rot"][..., 1]
    tc, ts = targets.reg[..., 6], targets.reg[..., 7]
    aux = (jnp.abs(c * c - s * s - (tc * tc - ts * ts))
           + jnp.abs(2.0 * c * s - 2.0 * tc * ts)) * targets.mask
    aux_loss = jnp.sum(aux) / jnp.maximum(jnp.sum(targets.mask) * 2, 1.0)
    # direction term: the aux + primary combination has a genuine LOCAL
    # MINIMUM at the pi-flipped vector v = -t (round-4 run: raw heading
    # median 154.8 deg, i.e. direction frozen at whichever mode each cell
    # picked early; the wedge cue itself is fully identifiable from
    # per-pillar max-z — tools/heading_probe.py probe: 1.00 direction
    # accuracy — so the failure was pure loss landscape).  Along the
    # radial escape path v = alpha*t the aux rises as |alpha^2-1| (max
    # ~0.177 at the zero vector) while the primary falls at only
    # ~(|tc|+|ts|)/16 per unit alpha — the barrier wins.  This term is
    # 1 - v.t / max(|v|, 1): for |v| >= 1 the rotational 1 - cos(angle)
    # whose gradient is tangential, and for small |v| a BOUNDED linear
    # pull toward t — along the radial path its slope (-1 per unit alpha
    # at w_dir's weight) dominates the aux barrier (+0.35 peak), so the
    # flipped mode stops being a local minimum at all.  Weight chosen by
    # tiny-config A/B (tools/heading_probe.py ab, 800 steps): 0.25 leaves
    # recall / mod-pi untouched (0.53 vs 0.54 frac<15deg), 1.0 drags both
    # down (mod-pi 13.3 -> 32.8 deg median — the rotation pull outmuscles
    # localization early), and a plain 1/sqrt(|v|^2+eps) normalization was
    # measured WORSE than no term at any weight (mod-pi 13.6 -> 48.6 deg):
    # its 1/|v| gradients blow up exactly where training starts
    # (|v| ~ 0.15 at init).  The tiny config cannot resolve the LATE-phase
    # direction escape (its mod-pi phase never converges in 800 steps);
    # the full-run receipt is TRAIN_r05.json's raw-heading stats.
    norm = jnp.maximum(jnp.sqrt(c * c + s * s + 1e-12), 1.0)
    dir_cos = (c * tc + s * ts) / norm
    dir_loss = jnp.sum((1.0 - dir_cos) * targets.mask) / jnp.maximum(
        jnp.sum(targets.mask), 1.0)
    return (hm_loss + 0.25 * reg_loss + aux_weight * aux_loss
            + dir_weight * dir_loss)


def batched_loss(params, points, num_points, targets: Targets,
                 cfg: DSVTConfig, remat: bool = None,
                 dir_weight: float = 0.25,
                 aux_weight: float = 0.25) -> jax.Array:
    # remat + SEQUENTIAL frames on TPU: jax.checkpoint makes the backward
    # recompute each frame's forward instead of storing every stage
    # activation, and lax.map (not vmap) keeps only ONE frame's graph live
    # at a time — vmapped batch-2 full-config frames OOM'd the 16 GB v5e
    # chip even with remat (15.86 G requested; 16.01 G without).  The
    # standard TPU memory/FLOPs trade: the forward is ~1/3 of the training
    # step's FLOPs, and single-chip batching is dispatch amortization, not
    # parallelism (multi-chip DP shards frames across chips instead,
    # parallel/mesh.py).  CPU (the test suite) keeps the vmap form, which
    # is ~5x faster to trace/run at tiny configs; equivalence is pinned by
    # test_training.py.
    if remat is None:
        remat = jax.default_backend() == "tpu"
    if remat:
        per_frame = jax.lax.map(
            jax.checkpoint(lambda pnt: detection_loss(
                params, pnt[0], pnt[1], pnt[2], cfg, dir_weight,
                aux_weight)),
            (points, num_points, targets))
    else:
        per_frame = jax.vmap(
            lambda p, n, t: detection_loss(params, p, n, t, cfg, dir_weight,
                                           aux_weight))(
            points, num_points, targets)
    return jnp.mean(per_frame)


def make_train_step(cfg: DSVTConfig, optimizer=None,
                    dir_weight: float = 0.25, aux_weight: float = 0.25):
    optimizer = optimizer or optax.adamw(1e-4)

    def train_step(params, opt_state, points, num_points, targets):
        loss, grads = jax.value_and_grad(
            lambda p: batched_loss(p, points, num_points, targets, cfg,
                                   dir_weight=dir_weight,
                                   aux_weight=aux_weight))(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return optimizer, train_step


def save_train_state(path: str, params, opt_state, step: int = 0) -> str:
    """Checkpoint params + optimizer state (VERDICT r1 task 7).

    Flat npz keyed by pytree paths: no pickle, loadable anywhere.  The
    reference's only checkpoint artifacts are the .wts dump and the
    serialized engine (SURVEY §5); training state is a new capability.
    Returns the actual file path (np.savez appends .npz when missing)."""
    import numpy as np

    flat = {}
    for tree, tag in ((params, "p"), (opt_state, "o")):
        leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
        for keypath, leaf in leaves_with_paths:
            flat[f"{tag}:{jax.tree_util.keystr(keypath)}"] = np.asarray(leaf)
    flat["step"] = np.int64(step)
    if not path.endswith(".npz"):
        path = path + ".npz"
    np.savez(path, **flat)
    return path


def load_train_state(path: str, params_template, opt_state_template):
    """Restore (params, opt_state, step) into the templates' structure."""
    import numpy as np

    data = np.load(path)
    out = []
    for tree, tag in ((params_template, "p"), (opt_state_template, "o")):
        paths, treedef = jax.tree_util.tree_flatten_with_path(tree)
        leaves = []
        for keypath, leaf in paths:
            arr = data[f"{tag}:{jax.tree_util.keystr(keypath)}"]
            assert arr.shape == jnp.shape(leaf), (keypath, arr.shape)
            leaves.append(jnp.asarray(arr, dtype=jnp.asarray(leaf).dtype))
        out.append(jax.tree_util.tree_unflatten(treedef, leaves))
    return out[0], out[1], int(data["step"])


def random_targets(rng, cfg: DSVTConfig, batch: int) -> Targets:
    """Synthetic targets for smoke/dryrun tests."""
    import numpy as np
    H, W = cfg.grid_size[1], cfg.grid_size[0]
    hm = np.zeros((batch, H, W, cfg.num_classes), np.float32)
    reg = np.zeros((batch, H, W, 8), np.float32)
    mask = np.zeros((batch, H, W), np.float32)
    for b in range(batch):
        for _ in range(5):
            y, x = rng.integers(2, H - 2), rng.integers(2, W - 2)
            c = rng.integers(0, cfg.num_classes)
            hm[b, y, x, c] = 1.0
            hm[b, y - 1:y + 2, x - 1:x + 2, c] = np.maximum(
                hm[b, y - 1:y + 2, x - 1:x + 2, c], 0.5)
            hm[b, y, x, c] = 1.0
            mask[b, y, x] = 1.0
            reg[b, y, x] = rng.normal(0, 0.3, 8)
    return Targets(heatmap=jnp.asarray(hm), reg=jnp.asarray(reg),
                   mask=jnp.asarray(mask))
