"""Weight management: checkpoint names, loaders, and inference-time folding.

The reference consumes a text ``.wts`` dump of the upstream DSVT torch
checkpoint (reference: tools/gen_wts.py:86-99 writes it, include/helper.h:328-439
reads it and splits fused ``*.in_proj_*`` QKV blobs into ``.query/.key/.value``
thirds).  We keep exactly that name contract — ``module.vfe.*``,
``module.backbone_3d.*``, ``module.backbone_2d.*``, ``module.dense_head.*`` —
so real DSVT checkpoints convert directly, and additionally accept ``.npz``
and torch ``.pth`` checkpoints.

At load time all inference-only algebra is folded once on the host:
  * BatchNorm1d/2d -> affine scale/shift folded into the preceding
    linear/conv weights (the reference folds BN into TRT IScaleLayers at
    engine build, dsvt-ai-trt.cpp:99-180; we go one step further and fold
    into the matmul itself).
  * torch [out,in] linears -> [in,out] so the compute path is plain x @ w.
  * torch OIHW convs -> HWIO for XLA's native TPU layout.
"""

from __future__ import annotations

import struct
from typing import Dict, List

import numpy as np

from .config import (DSVTConfig, head_branches,
                     BACKBONE2D_STAGES, BACKBONE2D_DEBLOCK)

Raw = Dict[str, np.ndarray]

# ---------------------------------------------------------------------------
# Raw parameter specification (name -> shape), torch state_dict layout.
# ---------------------------------------------------------------------------


def _bn_names(prefix: str, c: int) -> Dict[str, tuple]:
    return {
        f"{prefix}.weight": (c,),
        f"{prefix}.bias": (c,),
        f"{prefix}.running_mean": (c,),
        f"{prefix}.running_var": (c,),
    }


def param_spec(cfg: DSVTConfig) -> Dict[str, tuple]:
    """All raw tensor names and shapes, matching the upstream checkpoint.

    QKV projections appear pre-split (``.query/.key/.value``) exactly as the
    reference's loadWeights_new leaves them in its weightMap
    (helper.h:353-434).
    """
    d = cfg.d_model
    spec: Dict[str, tuple] = {}

    # PFN (reference graph: dsvt-ai-trt.cpp:577-590)
    c0, c1 = cfg.pfn_channels
    spec["module.vfe.pfn_layers.0.linear.weight"] = (c0, cfg.pillar_feature_num)
    spec.update(_bn_names("module.vfe.pfn_layers.0.norm", c0))
    spec["module.vfe.pfn_layers.1.linear.weight"] = (c1, 2 * c0)
    spec.update(_bn_names("module.vfe.pfn_layers.1.norm", c1))

    # position embedding MLPs: posembed_layers.0.{block}.{pass} (cpp:603-637)
    for b in range(cfg.num_blocks):
        for e in range(2):
            p = f"module.backbone_3d.input_layer.posembed_layers.0.{b}.{e}.position_embedding_head"
            spec[f"{p}.0.weight"] = (d, 2)
            spec[f"{p}.0.bias"] = (d,)
            spec.update(_bn_names(f"{p}.1", d))
            spec[f"{p}.3.weight"] = (d, d)
            spec[f"{p}.3.bias"] = (d,)

    # DSVT blocks: stage_0.{b}.encoder_list.{e} (cpp:648-1120)
    for b in range(cfg.num_blocks):
        for e in range(2):
            p = f"module.backbone_3d.stage_0.{b}.encoder_list.{e}"
            for part in ("query", "key", "value"):
                spec[f"{p}.win_attn.self_attn.in_proj_weight.{part}"] = (d, d)
                spec[f"{p}.win_attn.self_attn.in_proj_bias.{part}"] = (d,)
            spec[f"{p}.win_attn.self_attn.out_proj.weight"] = (d, d)
            spec[f"{p}.win_attn.self_attn.out_proj.bias"] = (d,)
            for ln in ("norm1", "norm2"):
                spec[f"{p}.win_attn.{ln}.weight"] = (d,)
                spec[f"{p}.win_attn.{ln}.bias"] = (d,)
            spec[f"{p}.win_attn.linear1.weight"] = (cfg.ffn_dim, d)
            spec[f"{p}.win_attn.linear1.bias"] = (cfg.ffn_dim,)
            spec[f"{p}.win_attn.linear2.weight"] = (d, cfg.ffn_dim)
            spec[f"{p}.win_attn.linear2.bias"] = (d,)
            spec[f"{p}.norm.weight"] = (d,)
            spec[f"{p}.norm.bias"] = (d,)
        spec[f"module.backbone_3d.residual_norm_stage_0.{b}.weight"] = (d,)
        spec[f"module.backbone_3d.residual_norm_stage_0.{b}.bias"] = (d,)

    # 2D BEV ResNet (cpp:1140-1364)
    in_ch = d
    for s, (units, ch, _stride) in enumerate(BACKBONE2D_STAGES):
        for u in range(units):
            p = f"module.backbone_2d.blocks.{s}.{u}"
            u_in = in_ch if u == 0 else ch
            spec[f"{p}.conv1.weight"] = (ch, u_in, 3, 3)
            spec.update(_bn_names(f"{p}.bn1", ch))
            spec[f"{p}.conv2.weight"] = (ch, ch, 3, 3)
            spec.update(_bn_names(f"{p}.bn2", ch))
            if u == 0:
                spec[f"{p}.downsample_layer.0.weight"] = (ch, u_in, 1, 1)
                spec.update(_bn_names(f"{p}.downsample_layer.1", ch))
        in_ch = ch
    stage_ch = [c for (_u, c, _s) in BACKBONE2D_STAGES]
    for s, (k, _stride) in enumerate(BACKBONE2D_DEBLOCK):
        # ConvTranspose2d weight layout: (in, out, kH, kW)
        spec[f"module.backbone_2d.deblocks.{s}.0.weight"] = (stage_ch[s], 128, k, k)
        spec.update(_bn_names(f"module.backbone_2d.deblocks.{s}.1", 128))

    # CenterHead (cpp:1369-1468)
    spec["module.dense_head.shared_conv.0.weight"] = (cfg.head_shared_channels, 128 * 3, 3, 3)
    spec.update(_bn_names("module.dense_head.shared_conv.1", cfg.head_shared_channels))
    for name, out_c in head_branches(cfg):
        p = f"module.dense_head.heads_list.0.{name}"
        spec[f"{p}.0.0.weight"] = (cfg.head_conv_channels, cfg.head_shared_channels, 3, 3)
        spec.update(_bn_names(f"{p}.0.1", cfg.head_conv_channels))
        spec[f"{p}.1.weight"] = (out_c, cfg.head_conv_channels, 3, 3)
        spec[f"{p}.1.bias"] = (out_c,)

    return spec


def random_raw(cfg: DSVTConfig, seed: int = 0, scale: float = 0.05) -> Raw:
    """Synthesize a random checkpoint with the real name/shape contract.

    Used for goldens and benchmarks while no real ``dsvt.wts`` is available
    (the reference snapshot itself ships without it — .MISSING_LARGE_BLOBS).
    """
    rng = np.random.default_rng(seed)
    raw: Raw = {}
    for name, shape in param_spec(cfg).items():
        if name.endswith("running_var"):
            raw[name] = np.abs(rng.normal(1.0, 0.1, shape)).astype(np.float32)
        elif name.endswith("running_mean"):
            raw[name] = rng.normal(0.0, scale, shape).astype(np.float32)
        elif ".norm" in name or "bn" in name or "norm1" in name or name.endswith((".weight",)) and len(shape) == 1:
            # 1-D gamma / LN weights near 1, biases near 0
            if name.endswith(".weight"):
                raw[name] = np.ones(shape, np.float32) + rng.normal(0, 0.02, shape).astype(np.float32)
            else:
                raw[name] = rng.normal(0, scale, shape).astype(np.float32)
        else:
            # He/fan-in scaling keeps activations O(1) through the 12-conv
            # BEV stack (a fixed std amplifies ~2x per conv and saturates
            # every head output)
            if len(shape) >= 2:
                fan_in = int(np.prod(shape[1:]))
                std = float(np.sqrt(2.0 / fan_in))
            else:
                std = scale
            raw[name] = rng.normal(0.0, std, shape).astype(np.float32)

    # Make the synthetic checkpoint produce *realistic* detections instead of
    # exp-overflowed garbage: tame the head's final convs and set biases so
    # heatmap scores sit around the 0.3 threshold and dims decode to a few
    # meters.  Without this, parity/NMS behavior on random weights is
    # degenerate (dims ~ e^50).
    head_bias = {"hm": -2.0, "dim": 0.3, "center": 0.2, "center_z": -0.5,
                 "rot": 0.2, "iou": 0.0}
    for branch, bias in head_bias.items():
        wname = f"module.dense_head.heads_list.0.{branch}.1.weight"
        bname = f"module.dense_head.heads_list.0.{branch}.1.bias"
        raw[wname] = rng.normal(0, 0.02, raw[wname].shape).astype(np.float32)
        raw[bname] = (bias + rng.normal(0, 0.1, raw[bname].shape)).astype(np.float32)
    return raw


def calibrated_raw(cfg: DSVTConfig, points, num_points, seed: int = 0,
                   n_boxes: int = 40) -> Raw:
    """A structured synthetic checkpoint that produces a *sparse* set of
    confident detections on the given calibration cloud.

    random_raw alone yields thousands of above-threshold noise detections,
    so the per-class top-k waterline sits in a dense score region and box
    membership churns under any numeric perturbation (precision change,
    accumulation order) — parity can then only be asserted loosely.  Here
    the heatmap branch bias is shifted so that only ~n_boxes cells clear
    the 0.3 score threshold: the top-k never truncates, every confident box
    is far from the waterline, and cross-implementation / cross-precision
    parity becomes assertable at ~1.0 (VERDICT r1 tasks 1 and 6).
    """
    raw = random_raw(cfg, seed)
    # car-sized boxes: tiny random-weight dims (~exp(0) * noise ~ 0.2 m)
    # make IoU matching degenerate — a one-cell center flip zeroes the
    # overlap.  Pin the dim branch to quiet weights + log(car) biases so a
    # 0.32 m drift keeps IoU >= 0.8 like real detections.
    rng = np.random.default_rng(seed + 1)
    wname = "module.dense_head.heads_list.0.dim.1.weight"
    bname_d = "module.dense_head.heads_list.0.dim.1.bias"
    raw[wname] = rng.normal(0, 0.005, raw[wname].shape).astype(np.float32)
    raw[bname_d] = np.log([4.2, 1.9, 1.7]).astype(np.float32)
    # ... and decisive headings: raw random rot outputs are ~0, so the
    # decoded atan2 is numerically unstable (a 0.01 logit drift can rotate
    # a box 45 degrees and sink its IoU) — trained rot heads saturate
    # cos/sin far from the origin
    wname_r = "module.dense_head.heads_list.0.rot.1.weight"
    bname_r = "module.dense_head.heads_list.0.rot.1.bias"
    raw[wname_r] = rng.normal(0, 0.02, raw[wname_r].shape).astype(np.float32)
    raw[bname_r] = np.array([0.9, 0.35], np.float32)

    from .model.detector import forward_debug  # local: avoids import cycle

    params = prepare_params(raw, cfg)
    dbg = forward_debug(params, points, num_points, cfg)
    logits = np.asarray(dbg.head_out["hm"], np.float64).ravel()
    kth = np.sort(logits)[-n_boxes]
    # shift so the n_boxes-th largest logit lands at sigmoid^-1(0.38):
    # confident boxes sit >=0.08 above the 0.3 threshold, everything else
    # falls well below it
    shift = np.log(0.38 / 0.62) - kth
    bname = f"module.dense_head.heads_list.0.hm.1.bias"
    raw[bname] = (raw[bname] + np.float32(shift)).astype(np.float32)
    return raw


# ---------------------------------------------------------------------------
# Loaders
# ---------------------------------------------------------------------------


def load_wts(path: str) -> Raw:
    """Parse the reference's text .wts format (helper.h:286-439).

    Format: first line = tensor count; then per tensor one line
    ``name length hex hex ...`` with big-endian float32 hex words
    (gen_wts.py:86-99).  Fused ``*.in_proj_*`` blobs are split into thirds
    named ``.query/.key/.value`` exactly like loadWeights_new.
    """
    raw: Raw = {}
    with open(path, "r") as f:
        count = int(f.readline().strip())
        for _ in range(count):
            line = f.readline().split()
            name, n = line[0], int(line[1])
            words = line[2:2 + n]
            arr = np.frombuffer(
                bytes.fromhex("".join(w.zfill(8) for w in words)),
                dtype=">f4").astype(np.float32)
            assert arr.size == n, f"{name}: expected {n} values, got {arr.size}"
            if ".in_proj_" in name:
                third = n // 3
                for i, part in enumerate(("query", "key", "value")):
                    raw[f"{name}.{part}"] = arr[i * third:(i + 1) * third].copy()
            else:
                raw[name] = arr
    return raw


def save_wts(raw: Raw, path: str) -> None:
    """Write the .wts text format (gen_wts.py:86-99), re-fusing QKV splits."""
    fused: Dict[str, np.ndarray] = {}
    pending: Dict[str, Dict[str, np.ndarray]] = {}
    for name, arr in raw.items():
        for part in ("query", "key", "value"):
            suffix = f".{part}"
            if name.endswith(suffix) and ".in_proj_" in name:
                base = name[: -len(suffix)]
                pending.setdefault(base, {})[part] = arr
                break
        else:
            fused[name] = arr
    for base, parts in pending.items():
        fused[base] = np.concatenate(
            [parts["query"].ravel(), parts["key"].ravel(), parts["value"].ravel()])
    with open(path, "w") as f:
        f.write(f"{len(fused)}\n")
        for name, arr in fused.items():
            flat = np.asarray(arr, np.float32).ravel()
            f.write(f"{name} {flat.size} ")
            f.write(" ".join(struct.pack(">f", float(v)).hex() for v in flat))
            f.write("\n")


def load_npz(path: str) -> Raw:
    data = np.load(path)
    raw = {}
    for name in data.files:
        arr = np.asarray(data[name], np.float32)
        if ".in_proj_" in name and not name.endswith((".query", ".key", ".value")):
            third = arr.shape[0] // 3
            flat = arr.reshape(arr.shape[0], -1)
            for i, part in enumerate(("query", "key", "value")):
                raw[f"{name}.{part}"] = flat[i * third:(i + 1) * third]
        else:
            raw[name] = arr
    return raw


def save_npz(raw: Raw, path: str) -> None:
    np.savez(path, **raw)


def load_torch(path: str) -> Raw:
    """Load a torch checkpoint (cpu) and split fused in_proj tensors."""
    import torch  # local import; torch is an offline-tool dependency only

    state = torch.load(path, map_location="cpu")
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    raw: Raw = {}
    for name, tensor in state.items():
        arr = tensor.detach().cpu().numpy().astype(np.float32)
        if not name.startswith("module."):
            name = "module." + name
        if ".in_proj_" in name:
            third = arr.shape[0] // 3
            flat = arr.reshape(arr.shape[0], -1)
            for i, part in enumerate(("query", "key", "value")):
                raw[f"{name}.{part}"] = flat[i * third:(i + 1) * third].reshape(
                    (third,) + arr.shape[1:])
        else:
            raw[name] = arr
    return raw


def load_checkpoint(path: str) -> Raw:
    if path.endswith(".wts"):
        return load_wts(path)
    if path.endswith(".npz"):
        return load_npz(path)
    return load_torch(path)


# ---------------------------------------------------------------------------
# Folding into the compute-ready pytree
# ---------------------------------------------------------------------------


def _bn_affine(raw: Raw, prefix: str, eps: float):
    g = raw[f"{prefix}.weight"]
    b = raw[f"{prefix}.bias"]
    mean = raw[f"{prefix}.running_mean"]
    var = raw[f"{prefix}.running_var"]
    scale = g / np.sqrt(var + eps)
    shift = b - mean * scale
    return scale.astype(np.float32), shift.astype(np.float32)


def _linear_bn(raw: Raw, lin: str, bn: str, eps: float, bias: bool = False):
    """Fold linear (torch [out,in]) + BN1d into x @ w + b.

    All fold helpers reshape from the BN/branch channel counts, because
    the .wts text format stores shapeless flat blobs (gen_wts.py:86-99 —
    the reference's loader also reshapes at the consumer, helper.h:288)."""
    scale, shift = _bn_affine(raw, bn, eps)
    w = raw[f"{lin}.weight"].reshape(len(scale), -1)
    wf = (w * scale[:, None]).T.astype(np.float32)  # [in, out]
    bf = shift.copy()
    if bias:
        bf = bf + raw[f"{lin}.bias"] * scale
    return wf, bf.astype(np.float32)


def _linear(raw: Raw, prefix: str, in_dim: int):
    w = raw[f"{prefix}.weight"].reshape(-1, in_dim)
    return w.T.astype(np.float32).copy(), raw[f"{prefix}.bias"].astype(np.float32).copy()


def _conv_bn(raw: Raw, conv: str, bn: str, eps: float, kernel=(3, 3)):
    """Fold OIHW conv + BN2d into HWIO conv + bias (flat blobs reshaped
    from the BN channel count + the known kernel size)."""
    scale, shift = _bn_affine(raw, bn, eps)
    w = raw[f"{conv}.weight"].reshape(  # [O, I, H, W]
        len(scale), -1, kernel[0], kernel[1])
    w = w * scale[:, None, None, None]
    return np.transpose(w, (2, 3, 1, 0)).astype(np.float32).copy(), shift


def _conv_bias(raw: Raw, conv: str, out_ch: int, kernel=(3, 3)):
    w = raw[f"{conv}.weight"].reshape(out_ch, -1, kernel[0], kernel[1])
    return (np.transpose(w, (2, 3, 1, 0)).astype(np.float32).copy(),
            raw[f"{conv}.bias"].astype(np.float32).copy())


def prepare_params(raw: Raw, cfg: DSVTConfig) -> Dict:
    """Fold the raw checkpoint into the compute-ready nested-dict pytree."""
    d = cfg.d_model
    c0, c1 = cfg.pfn_channels
    p: Dict = {}

    w0, b0 = _linear_bn(raw, "module.vfe.pfn_layers.0.linear",
                        "module.vfe.pfn_layers.0.norm", cfg.bn1d_eps)
    w1, b1 = _linear_bn(raw, "module.vfe.pfn_layers.1.linear",
                        "module.vfe.pfn_layers.1.norm", cfg.bn1d_eps)
    p["vfe"] = {"l0": {"w": w0, "b": b0}, "l1": {"w": w1, "b": b1}}

    pos: List[List[Dict]] = []
    for b in range(cfg.num_blocks):
        row = []
        for e in range(2):
            pre = f"module.backbone_3d.input_layer.posembed_layers.0.{b}.{e}.position_embedding_head"
            w1e, b1e = _linear_bn(raw, f"{pre}.0", f"{pre}.1", cfg.bn1d_eps, bias=True)
            w2e, b2e = _linear(raw, f"{pre}.3", d)
            row.append({"w1": w1e, "b1": b1e, "w2": w2e, "b2": b2e})
        pos.append(row)
    p["posembed"] = pos

    blocks: List[Dict] = []
    for b in range(cfg.num_blocks):
        encs = []
        for e in range(2):
            pre = f"module.backbone_3d.stage_0.{b}.encoder_list.{e}"
            attn = f"{pre}.win_attn.self_attn"
            enc = {}
            for part, key in (("query", "q"), ("key", "k"), ("value", "v")):
                w = raw[f"{attn}.in_proj_weight.{part}"].reshape(d, d)
                enc[f"w{key}"] = w.T.astype(np.float32).copy()
                enc[f"b{key}"] = raw[f"{attn}.in_proj_bias.{part}"].astype(np.float32).copy()
            enc["wo"], enc["bo"] = _linear(raw, f"{attn}.out_proj", d)
            for ln, key in (("norm1", "ln1"), ("norm2", "ln2")):
                enc[f"{key}_g"] = raw[f"{pre}.win_attn.{ln}.weight"].astype(np.float32)
                enc[f"{key}_b"] = raw[f"{pre}.win_attn.{ln}.bias"].astype(np.float32)
            enc["ffn_w1"], enc["ffn_b1"] = _linear(raw, f"{pre}.win_attn.linear1", d)
            enc["ffn_w2"], enc["ffn_b2"] = _linear(raw, f"{pre}.win_attn.linear2", cfg.ffn_dim)
            enc["norm_g"] = raw[f"{pre}.norm.weight"].astype(np.float32)
            enc["norm_b"] = raw[f"{pre}.norm.bias"].astype(np.float32)
            encs.append(enc)
        blocks.append({
            "enc": encs,
            "res_g": raw[f"module.backbone_3d.residual_norm_stage_0.{b}.weight"].astype(np.float32),
            "res_b": raw[f"module.backbone_3d.residual_norm_stage_0.{b}.bias"].astype(np.float32),
        })
    p["blocks"] = blocks

    stages = []
    for s, (units, ch, _stride) in enumerate(BACKBONE2D_STAGES):
        stage = []
        for u in range(units):
            pre = f"module.backbone_2d.blocks.{s}.{u}"
            unit = {}
            unit["conv1_w"], unit["conv1_b"] = _conv_bn(raw, f"{pre}.conv1", f"{pre}.bn1", cfg.bn2d_eps)
            unit["conv2_w"], unit["conv2_b"] = _conv_bn(raw, f"{pre}.conv2", f"{pre}.bn2", cfg.bn2d_eps)
            if u == 0:
                unit["down_w"], unit["down_b"] = _conv_bn(
                    raw, f"{pre}.downsample_layer.0", f"{pre}.downsample_layer.1", cfg.bn2d_eps,
                    kernel=(1, 1))
            stage.append(unit)
        stages.append(stage)
    deblocks = []
    for s, (k, _stride) in enumerate(BACKBONE2D_DEBLOCK):
        pre = f"module.backbone_2d.deblocks.{s}"
        scale, shift = _bn_affine(raw, f"{pre}.1", cfg.bn2d_eps)
        # ConvTranspose2d [in, out, k, k]; out from the BN channel count
        w = raw[f"{pre}.0.weight"].reshape(-1, len(scale), k, k)
        # fold BN over out channels; keep layout [in, out, k, k] for the
        # einsum-based stride==kernel upsampling in backbone2d
        w = w * scale[None, :, None, None]
        deblocks.append({"w": w.astype(np.float32).copy(), "b": shift})
    p["backbone2d"] = {"stages": stages, "deblocks": deblocks}

    head: Dict = {}
    head["shared_w"], head["shared_b"] = _conv_bn(
        raw, "module.dense_head.shared_conv.0", "module.dense_head.shared_conv.1", cfg.bn2d_eps)
    for name, c in head_branches(cfg):
        pre = f"module.dense_head.heads_list.0.{name}"
        w0h, b0h = _conv_bn(raw, f"{pre}.0.0", f"{pre}.0.1", cfg.bn2d_eps)
        w1h, b1h = _conv_bias(raw, f"{pre}.1", c)
        head[name] = {"w0": w0h, "b0": b0h, "w1": w1h, "b1": b1h}
    p["head"] = head
    return p


def random_params(cfg: DSVTConfig, seed: int = 0) -> Dict:
    return prepare_params(random_raw(cfg, seed), cfg)


# ---------------------------------------------------------------------------
# Unfolding: compute-ready pytree -> raw checkpoint (for .wts export of
# trained parameters, keeping the module.* name contract)
# ---------------------------------------------------------------------------


def _identity_bn(c: int, eps: float, shift: np.ndarray) -> Dict[str, np.ndarray]:
    """BN stats that make the affine exactly (scale=1, shift=shift):
    running_var = 1 - eps so sqrt(var + eps) == 1."""
    return {
        "weight": np.ones(c, np.float32),
        "bias": np.asarray(shift, np.float32),
        "running_mean": np.zeros(c, np.float32),
        "running_var": np.full(c, 1.0 - eps, np.float32),
    }


def unfold_params(params: Dict, cfg: DSVTConfig) -> Raw:
    """Inverse of prepare_params: a raw state-dict that reproduces the same
    computation.  BN folds are not uniquely invertible, so folded
    linear/conv+BN pairs export as (trained weight, identity BN with the
    trained bias as BN shift) — numerically identical under prepare_params
    and loadable by the reference's loadWeights_new / the torch oracle."""
    d = cfg.d_model
    raw: Raw = {}
    asnp = lambda t: np.asarray(t, np.float32)

    def lin_bn(prefix_lin, prefix_bn, w, b, eps, with_bias=False):
        raw[f"{prefix_lin}.weight"] = asnp(w).T.copy()        # [out, in]
        if with_bias:
            raw[f"{prefix_lin}.bias"] = np.zeros(w.shape[1], np.float32)
        for k, v in _identity_bn(w.shape[1], eps, asnp(b)).items():
            raw[f"{prefix_bn}.{k}"] = v

    def conv_bn(prefix_conv, prefix_bn, w, b, eps):
        raw[f"{prefix_conv}.weight"] = np.transpose(asnp(w), (3, 2, 0, 1)).copy()
        for k, v in _identity_bn(w.shape[3], eps, asnp(b)).items():
            raw[f"{prefix_bn}.{k}"] = v

    lin_bn("module.vfe.pfn_layers.0.linear", "module.vfe.pfn_layers.0.norm",
           params["vfe"]["l0"]["w"], params["vfe"]["l0"]["b"], cfg.bn1d_eps)
    lin_bn("module.vfe.pfn_layers.1.linear", "module.vfe.pfn_layers.1.norm",
           params["vfe"]["l1"]["w"], params["vfe"]["l1"]["b"], cfg.bn1d_eps)

    for b_i in range(cfg.num_blocks):
        for e in range(2):
            mlp = params["posembed"][b_i][e]
            pre = (f"module.backbone_3d.input_layer.posembed_layers.0."
                   f"{b_i}.{e}.position_embedding_head")
            lin_bn(f"{pre}.0", f"{pre}.1", mlp["w1"], mlp["b1"], cfg.bn1d_eps,
                   with_bias=True)
            raw[f"{pre}.3.weight"] = asnp(mlp["w2"]).T.copy()
            raw[f"{pre}.3.bias"] = asnp(mlp["b2"])

            enc = params["blocks"][b_i]["enc"][e]
            pre = f"module.backbone_3d.stage_0.{b_i}.encoder_list.{e}"
            attn = f"{pre}.win_attn.self_attn"
            for part, key in (("query", "q"), ("key", "k"), ("value", "v")):
                raw[f"{attn}.in_proj_weight.{part}"] = asnp(enc[f"w{key}"]).T.copy()
                raw[f"{attn}.in_proj_bias.{part}"] = asnp(enc[f"b{key}"])
            raw[f"{attn}.out_proj.weight"] = asnp(enc["wo"]).T.copy()
            raw[f"{attn}.out_proj.bias"] = asnp(enc["bo"])
            for ln, key in (("norm1", "ln1"), ("norm2", "ln2")):
                raw[f"{pre}.win_attn.{ln}.weight"] = asnp(enc[f"{key}_g"])
                raw[f"{pre}.win_attn.{ln}.bias"] = asnp(enc[f"{key}_b"])
            raw[f"{pre}.win_attn.linear1.weight"] = asnp(enc["ffn_w1"]).T.copy()
            raw[f"{pre}.win_attn.linear1.bias"] = asnp(enc["ffn_b1"])
            raw[f"{pre}.win_attn.linear2.weight"] = asnp(enc["ffn_w2"]).T.copy()
            raw[f"{pre}.win_attn.linear2.bias"] = asnp(enc["ffn_b2"])
            raw[f"{pre}.norm.weight"] = asnp(enc["norm_g"])
            raw[f"{pre}.norm.bias"] = asnp(enc["norm_b"])
        raw[f"module.backbone_3d.residual_norm_stage_0.{b_i}.weight"] = asnp(
            params["blocks"][b_i]["res_g"])
        raw[f"module.backbone_3d.residual_norm_stage_0.{b_i}.bias"] = asnp(
            params["blocks"][b_i]["res_b"])

    for s, stage in enumerate(params["backbone2d"]["stages"]):
        for u, unit in enumerate(stage):
            pre = f"module.backbone_2d.blocks.{s}.{u}"
            conv_bn(f"{pre}.conv1", f"{pre}.bn1", unit["conv1_w"],
                    unit["conv1_b"], cfg.bn2d_eps)
            conv_bn(f"{pre}.conv2", f"{pre}.bn2", unit["conv2_w"],
                    unit["conv2_b"], cfg.bn2d_eps)
            if "down_w" in unit:
                conv_bn(f"{pre}.downsample_layer.0", f"{pre}.downsample_layer.1",
                        unit["down_w"], unit["down_b"], cfg.bn2d_eps)
    for s, de in enumerate(params["backbone2d"]["deblocks"]):
        pre = f"module.backbone_2d.deblocks.{s}"
        raw[f"{pre}.0.weight"] = asnp(de["w"]).copy()  # already [in,out,k,k]
        for k, v in _identity_bn(de["w"].shape[1], cfg.bn2d_eps,
                                 asnp(de["b"])).items():
            raw[f"{pre}.1.{k}"] = v

    head = params["head"]
    conv_bn("module.dense_head.shared_conv.0", "module.dense_head.shared_conv.1",
            head["shared_w"], head["shared_b"], cfg.bn2d_eps)
    for name, _c in head_branches(cfg):
        pre = f"module.dense_head.heads_list.0.{name}"
        conv_bn(f"{pre}.0.0", f"{pre}.0.1", head[name]["w0"], head[name]["b0"],
                cfg.bn2d_eps)
        raw[f"{pre}.1.weight"] = np.transpose(
            asnp(head[name]["w1"]), (3, 2, 0, 1)).copy()
        raw[f"{pre}.1.bias"] = asnp(head[name]["b1"])
    return raw
