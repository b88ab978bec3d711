"""The restructured DSVT backbone (pillar-level projections with the
pos-embed linear folded in) must equal the naive reference formulation
(set-level q=k=x[inds]+pos[inds] projections) to fp tolerance."""

import numpy as np
import jax.numpy as jnp

from dsvt_ai_trt_tpu import weights
from dsvt_ai_trt_tpu.ops.voxelize import voxelize
from dsvt_ai_trt_tpu.ops.windows import window_partition, set_partition
from dsvt_ai_trt_tpu.ops.attention import set_attention, layer_norm, ffn
from dsvt_ai_trt_tpu.model.backbone3d import (backbone3d_forward,
                                              pos_embed_mlp, _with_dump_row,
                                              _scatter_back)
from dsvt_ai_trt_tpu.model.vfe import vfe_forward

from conftest import make_cloud


def _naive_backbone3d(x, wparts, sparts, params, cfg):
    eps = cfg.ln_eps
    pos = [[_with_dump_row(pos_embed_mlp(wparts[e].xy_centered,
                                         params["posembed"][b][e]))
            for e in range(2)] for b in range(cfg.num_blocks)]
    for b in range(cfg.num_blocks):
        sp = sparts[b % len(sparts)]
        x_in = x
        for e in range(2):
            enc = params["blocks"][b]["enc"][e]
            attn = set_attention(_with_dump_row(x), pos[b][e], sp.inds[e],
                                 sp.key_mask, enc, cfg.num_heads)
            attn_p = _scatter_back(attn, sp.canon[e], *sp.inds[e].shape)
            x1 = layer_norm(x + attn_p, enc["ln1_g"], enc["ln1_b"], eps)
            x2 = layer_norm(x1 + ffn(x1, enc), enc["ln2_g"], enc["ln2_b"], eps)
            x = layer_norm(x2 + x, enc["norm_g"], enc["norm_b"], eps)
        x = layer_norm(x + x_in, params["blocks"][b]["res_g"],
                       params["blocks"][b]["res_b"], eps)
    return x


def test_folded_projections_match_naive(tiny_cfg, rng):
    cfg = tiny_cfg
    params = weights.random_params(cfg, seed=6)
    pts, n = make_cloud(rng, cfg, 800)
    vox = voxelize(pts, n, cfg)
    feats = vfe_forward(vox, params["vfe"], cfg.max_pillars)
    wparts, sparts = [], []
    for spec in cfg.window_specs:
        wp = window_partition(vox.coords, vox.pillar_valid, spec, cfg)
        sparts.append(set_partition(wp, vox.pillar_valid, spec, cfg))
        wparts.append(wp)

    fast = backbone3d_forward(feats, wparts, sparts, params, cfg)
    naive = _naive_backbone3d(feats, wparts, sparts, params, cfg)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(naive),
                               atol=5e-4, rtol=5e-4)