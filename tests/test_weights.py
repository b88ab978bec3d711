import numpy as np

from dsvt_ai_trt_tpu import weights
from dsvt_ai_trt_tpu.config import DEFAULT_CONFIG


def test_param_spec_names_match_reference_contract():
    spec = weights.param_spec(DEFAULT_CONFIG)
    # spot-check the exact names consumed by the reference graph builder
    expected = [
        "module.vfe.pfn_layers.0.linear.weight",
        "module.vfe.pfn_layers.1.norm.running_var",
        "module.backbone_3d.input_layer.posembed_layers.0.0.0.position_embedding_head.0.weight",
        "module.backbone_3d.input_layer.posembed_layers.0.3.1.position_embedding_head.3.bias",
        "module.backbone_3d.stage_0.0.encoder_list.0.win_attn.self_attn.in_proj_weight.query",
        "module.backbone_3d.stage_0.3.encoder_list.1.win_attn.self_attn.out_proj.weight",
        "module.backbone_3d.stage_0.2.encoder_list.1.win_attn.linear1.weight",
        "module.backbone_3d.residual_norm_stage_0.3.weight",
        "module.backbone_2d.blocks.0.0.downsample_layer.0.weight",
        "module.backbone_2d.blocks.2.2.conv2.weight",
        "module.backbone_2d.deblocks.2.0.weight",
        "module.dense_head.shared_conv.0.weight",
        "module.dense_head.heads_list.0.hm.1.bias",
        "module.dense_head.heads_list.0.iou.0.0.weight",
    ]
    for name in expected:
        assert name in spec, name
    # shapes of a few key tensors
    assert spec["module.vfe.pfn_layers.0.linear.weight"] == (96, 10)
    assert spec["module.backbone_2d.deblocks.2.0.weight"] == (256, 128, 4, 4)
    assert spec["module.dense_head.heads_list.0.hm.1.weight"] == (10, 64, 3, 3)


def test_wts_roundtrip(tmp_path):
    cfg = DEFAULT_CONFIG
    raw = weights.random_raw(cfg, seed=7)
    # subset for speed
    keys = sorted(raw)[:20] + [
        "module.backbone_3d.stage_0.0.encoder_list.0.win_attn.self_attn.in_proj_weight.query",
        "module.backbone_3d.stage_0.0.encoder_list.0.win_attn.self_attn.in_proj_weight.key",
        "module.backbone_3d.stage_0.0.encoder_list.0.win_attn.self_attn.in_proj_weight.value",
    ]
    sub = {k: raw[k] for k in keys}
    path = str(tmp_path / "test.wts")
    weights.save_wts(sub, path)
    back = weights.load_wts(path)
    assert set(back) == set(sub)
    for k in sub:
        np.testing.assert_array_equal(back[k].ravel(),
                                      np.asarray(sub[k], np.float32).ravel())


def test_bn_folding_linear():
    """Folded linear+BN must equal the unfolded reference computation."""
    rng = np.random.default_rng(0)
    w = rng.normal(size=(8, 5)).astype(np.float32)   # torch [out, in]
    g = rng.normal(1, 0.1, 8).astype(np.float32)
    b = rng.normal(0, 0.1, 8).astype(np.float32)
    mean = rng.normal(0, 0.1, 8).astype(np.float32)
    var = np.abs(rng.normal(1, 0.1, 8)).astype(np.float32)
    raw = {"lin.weight": w, "bn.weight": g, "bn.bias": b,
           "bn.running_mean": mean, "bn.running_var": var}
    wf, bf = weights._linear_bn(raw, "lin", "bn", 1e-5)
    x = rng.normal(size=(4, 5)).astype(np.float32)
    ref = (x @ w.T - mean) / np.sqrt(var + 1e-5) * g + b
    np.testing.assert_allclose(x @ wf + bf, ref, atol=1e-5)


def test_prepare_params_shapes(tiny_cfg):
    p = weights.random_params(tiny_cfg, seed=1)
    d = tiny_cfg.d_model
    assert p["vfe"]["l0"]["w"].shape == (10, tiny_cfg.pfn_channels[0])
    assert p["vfe"]["l1"]["w"].shape == (2 * tiny_cfg.pfn_channels[0],
                                         tiny_cfg.pfn_channels[1])
    assert len(p["blocks"]) == tiny_cfg.num_blocks
    enc = p["blocks"][0]["enc"][0]
    assert enc["wq"].shape == (d, d)
    assert enc["ffn_w1"].shape == (d, tiny_cfg.ffn_dim)
    assert p["head"]["hm"]["w1"].shape == (3, 3, 64, tiny_cfg.num_classes)
    # conv weights are HWIO
    assert p["backbone2d"]["stages"][0][0]["conv1_w"].shape == (3, 3, d, 128)


def test_torch_checkpoint_loads_and_splits_qkv(tiny_cfg, tmp_path):
    """.pth loading: the upstream checkpoint carries FUSED in_proj tensors
    (torch nn.MultiheadAttention layout); load_torch must split them into
    the .query/.key/.value thirds exactly like the reference's
    loadWeights_new (helper.h:353-434), and the result must feed
    prepare_params."""
    import torch
    from dsvt_ai_trt_tpu import weights

    cfg = tiny_cfg
    raw = weights.random_raw(cfg, seed=6)

    # re-fuse the split tensors into a torch-style state dict
    state = {}
    pending = {}
    for name, arr in raw.items():
        base = None
        for part in ("query", "key", "value"):
            if name.endswith("." + part) and ".in_proj_" in name:
                base = name[: -(len(part) + 1)]
                pending.setdefault(base, {})[part] = arr
        if base is None:
            state[name] = torch.from_numpy(arr.copy())
    for base, parts in pending.items():
        state[base] = torch.from_numpy(np.concatenate(
            [parts["query"], parts["key"], parts["value"]]).copy())

    path = str(tmp_path / "ckpt.pth")
    torch.save(state, path)
    loaded = weights.load_checkpoint(path)

    assert set(loaded) == set(raw)
    for k in raw:
        np.testing.assert_array_equal(loaded[k].reshape(raw[k].shape), raw[k],
                                      err_msg=k)
    weights.prepare_params(loaded, cfg)  # must not raise


def test_wts_export_prepares_bitexact(tiny_cfg, tmp_path):
    """Trained-weights export chain: params -> unfold -> .wts text ->
    load_wts -> prepare_params must reproduce the original pytree
    BIT-exactly.  The .wts format stores shapeless flat blobs, so every
    fold helper must reshape from channel counts (a flat conv blob
    previously crashed prepare_params — the tools/train_run.py round
    trip is the deployment path this pins)."""
    import jax

    from dsvt_ai_trt_tpu import weights

    cfg = tiny_cfg
    params = weights.random_params(cfg, seed=2)
    raw = weights.unfold_params(jax.device_get(params), cfg)
    path = str(tmp_path / "export.wts")
    weights.save_wts(raw, path)
    p2 = weights.prepare_params(weights.load_wts(path), cfg)

    flat1 = jax.tree_util.tree_flatten_with_path(params)[0]
    flat2 = jax.tree_util.tree_flatten_with_path(p2)[0]
    assert len(flat1) == len(flat2)
    for (k1, a), (k2, b) in zip(flat1, flat2):
        assert jax.tree_util.keystr(k1) == jax.tree_util.keystr(k2)
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            err_msg=jax.tree_util.keystr(k1))
