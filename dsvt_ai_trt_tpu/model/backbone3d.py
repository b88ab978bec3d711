"""DSVT 3D backbone: 4 blocks x 2 rotated-set attention encoders.

Faithful to the reference graph wiring (dsvt-ai-trt.cpp:648-1120):

  for block b in 0..3:                      # stage_0.{b}
    sets = set_partition[b % 2]             # get_set_op_{b%2}
    x_in = block input
    for pass e in 0..1:                     # encoder_list.{e}, axis_id = e
      pos   = posembed_mlp[b][e](xy_centered of window partition e)   (!)
      attn  = MHA(q=k=x[inds]+pos[inds], v=x[inds], key_mask)
      x1    = LN1(x + scatter_back(attn))
      x2    = LN2(x1 + FFN(x1))
      x     = LN_enc(x2 + x)
    x = LN_res(x + x_in)                    # residual_norm_stage_0.{b}

(!) The pos-embed input coords come from window partition *e* while the set
indices come from partition *b%2* — that is exactly what the reference does
(embed_layer_0_{b}_{e} built from window_partition_{e}->getOutput(5),
cpp:603-637, consumed at cpp:653/704/...).

Scatter-back is a deterministic canonical-slot gather (see ops/windows.py)
instead of the reference's last-writer-wins scatter
(mapSetFeature2voxel.cu:258-275).
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

from ..config import DSVTConfig
from ..ops.attention import set_attention, layer_norm, ffn
from ..ops.common import dot_precision
from ..ops.windows import SetPartition, WindowPartition
from ..parallel.spatial import constrain_rows


def pos_embed_mlp(xy: jax.Array, mlp: dict, precision: str = "fp32") -> jax.Array:
    """linear(2->192)+BN1d(folded)+ReLU -> linear(192->192)
    (fullyConnectedBnLELU_fullyConnected, cpp:461-492)."""
    dt = jnp.bfloat16 if precision == "bf16" else jnp.float32
    prec = dot_precision(precision)
    h = jnp.einsum("pc,cd->pd", xy, mlp["w1"],
                   preferred_element_type=jnp.float32, precision=prec) + mlp["b1"]
    h = jnp.maximum(h, 0.0)
    return jnp.einsum("pc,cd->pd", h.astype(dt), mlp["w2"].astype(dt),
                      preferred_element_type=jnp.float32, precision=prec) + mlp["b2"]


def _with_dump_row(x: jax.Array) -> jax.Array:
    return jnp.concatenate([x, jnp.zeros((1, x.shape[-1]), x.dtype)], axis=0)


def _scatter_back(attn_out: jax.Array, canon: jax.Array) -> jax.Array:
    """Gather each pillar's canonical set-slot output.  attn_out: [S, K, C];
    canon: [P] flat slot (S*K = dump).  Returns [P, C]."""
    S, K, C = attn_out.shape
    flat = _with_dump_row(attn_out.reshape(S * K, C))
    return flat[canon]


def backbone3d_forward(pillar_feats: jax.Array,
                       window_parts: Sequence[WindowPartition],
                       set_parts: Sequence[SetPartition],
                       params: dict, cfg: DSVTConfig,
                       precision: str = "fp32") -> jax.Array:
    """pillar_feats: [P, 192] -> [P, 192] after 4 DSVT blocks."""
    eps = cfg.ln_eps

    # pos-embeds per (block, pass): computed once up front like the reference
    # (all 8 MLPs run before the blocks, cpp:603-637)
    pos: List[List[jax.Array]] = []
    for b in range(cfg.num_blocks):
        row = []
        for e in range(2):
            emb = pos_embed_mlp(window_parts[e].xy_centered,
                                params["posembed"][b][e], precision)
            row.append(_with_dump_row(emb))
        pos.append(row)

    x = pillar_feats
    for b in range(cfg.num_blocks):
        sp = set_parts[b % len(set_parts)]
        x_in = x
        for e in range(2):
            enc = params["blocks"][b]["enc"][e]
            attn = set_attention(_with_dump_row(x), pos[b][e],
                                 constrain_rows(sp.inds[e]),
                                 constrain_rows(sp.key_mask), enc,
                                 cfg.num_heads, precision)
            attn_p = _scatter_back(constrain_rows(attn), sp.canon[e])
            attn_p = constrain_rows(attn_p)
            x1 = layer_norm(x + attn_p, enc["ln1_g"], enc["ln1_b"], eps)
            x2 = layer_norm(x1 + ffn(x1, enc, precision),
                            enc["ln2_g"], enc["ln2_b"], eps)
            x = layer_norm(x2 + x, enc["norm_g"], enc["norm_b"], eps)
        x = layer_norm(x + x_in, params["blocks"][b]["res_g"],
                       params["blocks"][b]["res_b"], eps)
        x = constrain_rows(x)
    return x
