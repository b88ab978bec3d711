import dataclasses

import numpy as np
import jax.numpy as jnp

from dsvt_ai_trt_tpu.ops.postprocess import decode_and_filter


def _head_maps(rng, H, W, ncls):
    return {
        "hm": rng.normal(-4, 1.5, (H, W, ncls)).astype(np.float32),
        "center": rng.uniform(0, 1, (H, W, 2)).astype(np.float32),
        "center_z": rng.uniform(-1, 1, (H, W, 1)).astype(np.float32),
        "dim": rng.normal(0, 0.3, (H, W, 3)).astype(np.float32),
        "rot": rng.normal(0, 1, (H, W, 2)).astype(np.float32),
        "iou": rng.normal(0, 1, (H, W, 1)).astype(np.float32),
    }


def _decode_oracle(maps, cfg):
    H, W = maps["hm"].shape[:2]
    ncls = cfg.num_classes
    K = cfg.top_k
    hm = 1 / (1 + np.exp(-maps["hm"]))
    hm_flat = hm.transpose(2, 0, 1).reshape(ncls, H * W)
    per_cls_idx = np.argsort(-hm_flat, axis=1)[:, :K]
    per_cls_score = np.take_along_axis(hm_flat, per_cls_idx, axis=1)
    flat = per_cls_score.reshape(-1)
    sel = np.argsort(-flat)[:K]
    scores = flat[sel]
    classes = sel // K
    inds = per_cls_idx.reshape(-1)[sel]
    ys, xs = inds // W, inds % W
    results = []
    for i in range(K):
        c = inds[i]
        center = maps["center"].reshape(-1, 2)[c]
        cz = maps["center_z"].reshape(-1)[c]
        dim = np.exp(maps["dim"].reshape(-1, 3)[c])
        rot = maps["rot"].reshape(-1, 2)[c]
        x = (xs[i] + center[0]) * cfg.voxel_size[0] + cfg.pc_range_min[0]
        y = (ys[i] + center[1]) * cfg.voxel_size[1] + cfg.pc_range_min[1]
        heading = np.arctan2(rot[1], rot[0])
        ok = (cfg.pc_range_min[0] <= x < cfg.pc_range_max[0]
              and cfg.pc_range_min[1] <= y < cfg.pc_range_max[1]
              and cfg.pc_range_min[2] <= cz < cfg.pc_range_max[2]
              and scores[i] >= cfg.score_threshold)
        if ok:
            results.append([x, y, cz, dim[0], dim[1], dim[2], heading,
                            classes[i], scores[i]])
    return np.array(results, np.float32).reshape(-1, 9)


def test_decode_matches_oracle(tiny_cfg, rng):
    cfg = dataclasses.replace(tiny_cfg, score_threshold=0.05)
    H, W = cfg.grid_size[1], cfg.grid_size[0]
    maps = _head_maps(rng, H, W, cfg.num_classes)
    dets = decode_and_filter({k: jnp.asarray(v) for k, v in maps.items()}, cfg)
    ref = _decode_oracle(maps, cfg)
    count = int(dets.count)
    assert count == len(ref)
    mine = np.asarray(dets.boxes)[:count]
    # compare as score-ordered lists (ties can reorder equal scores)
    np.testing.assert_allclose(np.sort(mine[:, 8])[::-1],
                               np.sort(ref[:, 8])[::-1], atol=1e-6)
    mine_sorted = mine[np.lexsort(mine.T)]
    ref_sorted = ref[np.lexsort(ref.T)]
    np.testing.assert_allclose(mine_sorted, ref_sorted, atol=1e-4, rtol=1e-4)


def test_parity_atan_mode(tiny_cfg, rng):
    """parity_atan folds headings into (-pi/2, pi/2] like the TRT engine
    (atan instead of atan2, dsvt-ai-trt.cpp:1667-1669)."""
    cfg = dataclasses.replace(tiny_cfg, parity_atan=True, score_threshold=0.05)
    H, W = cfg.grid_size[1], cfg.grid_size[0]
    maps = _head_maps(rng, H, W, cfg.num_classes)
    dets = decode_and_filter({k: jnp.asarray(v) for k, v in maps.items()}, cfg)
    count = int(dets.count)
    headings = np.asarray(dets.boxes)[:count, 6]
    assert (np.abs(headings) <= np.pi / 2 + 1e-5).all()


def test_rows_past_count_zero(tiny_cfg, rng):
    cfg = tiny_cfg
    H, W = cfg.grid_size[1], cfg.grid_size[0]
    maps = _head_maps(rng, H, W, cfg.num_classes)
    dets = decode_and_filter({k: jnp.asarray(v) for k, v in maps.items()}, cfg)
    boxes = np.asarray(dets.boxes)
    assert (boxes[int(dets.count):] == 0).all()


def test_lazy_head_decode_matches_full(tiny_cfg, rng):
    """The lazy path (full-map hm + patch-einsum regression at selected
    cells) must reproduce the full-map conv decode exactly up to fp
    accumulation order."""
    import dataclasses
    from dsvt_ai_trt_tpu import weights
    from dsvt_ai_trt_tpu.model.backbone2d import backbone2d_forward
    from dsvt_ai_trt_tpu.model.head import head_forward
    from dsvt_ai_trt_tpu.ops.postprocess import decode_and_filter
    from conftest import make_cloud
    from dsvt_ai_trt_tpu.model.detector import forward_debug
    import jax.numpy as jnp

    cfg = tiny_cfg
    params = weights.random_params(cfg, seed=11)
    pts, n = make_cloud(rng, cfg, 900)
    dbg = forward_debug(params, jnp.asarray(pts), jnp.int32(n), cfg)

    full = decode_and_filter(dbg.head_out, cfg)
    lazy_out = head_forward(dbg.bev_features, params["head"], cfg.precision,
                            cfg=cfg, lazy=True)
    lazy = decode_and_filter(lazy_out, cfg, head_params=params["head"])

    assert int(full.count) == int(lazy.count)
    np.testing.assert_allclose(np.asarray(full.boxes), np.asarray(lazy.boxes),
                               atol=2e-4, rtol=1e-4)


def test_lazy_branches_exact_at_map_borders(tiny_cfg, rng):
    """Border top-k cells: the full-map conv2 reads ZERO padding for hidden
    positions outside the map; the lazy path must mask those positions the
    same way (not compute relu(conv1(zeros)+b0) there)."""
    import jax
    import jax.numpy as jnp
    from dsvt_ai_trt_tpu import weights
    from dsvt_ai_trt_tpu.config import head_branches
    from dsvt_ai_trt_tpu.ops.postprocess import decode_lazy_branches

    cfg = tiny_cfg
    H, W = cfg.grid_size[1], cfg.grid_size[0]
    head = weights.random_params(cfg, seed=9)["head"]
    shared = jnp.asarray(rng.normal(0, 1, (H, W, 64)).astype(np.float32))

    def conv(x, w, b):
        return jax.lax.conv_general_dilated(
            x[None], w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0] + b

    # corner/edge/interior cells
    cells = jnp.asarray([0, W - 1, (H - 1) * W, H * W - 1, W + 1,
                         (H // 2) * W + W // 2], jnp.int32)
    vals = decode_lazy_branches(shared, cells, head, head_branches(cfg))
    for name, _ in head_branches(cfg):
        if name == "hm":
            continue
        hidden = jnp.maximum(conv(shared, head[name]["w0"], head[name]["b0"]), 0.0)
        full = conv(hidden, head[name]["w1"], head[name]["b1"])
        full_flat = full.reshape(H * W, -1)[cells]
        np.testing.assert_allclose(np.asarray(vals[name]),
                                   np.asarray(full_flat), atol=1e-4,
                                   err_msg=name)
