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

TPU-native restructurings (exact algebra, no semantic change):
  * Q/K/V and output projections run on the [P, C] pillar arrays instead of
    the gathered [S*K, C] set layout — gathers commute with row-wise
    linears and P is ~3x smaller than S*K.
  * the pos-embed MLP's second linear folds into wq/wk per encoder:
    (x + h1@w2 + b2)@wq = x@wq + h1@(w2@wq) + (b2@wq), so the positional
    branch costs one matmul per projection instead of a separate embedding
    pass plus a gathered add.
  * scatter-back is a deterministic canonical-slot gather (ops/windows.py)
    instead of the reference's last-writer-wins scatter
    (mapSetFeature2voxel.cu:258-275).
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

from ..config import DSVTConfig
from ..ops.attention import set_attention_qkv, layer_norm, ffn
from ..ops.common import dot_precision
from ..ops.windows import SetPartition, WindowPartition
from ..parallel.spatial import constrain_rows


def _dense(x, w, b, precision):
    dt = jnp.bfloat16 if precision == "bf16" else jnp.float32
    y = jnp.einsum("pc,cd->pd", x.astype(dt), w.astype(dt),
                   preferred_element_type=jnp.float32,
                   precision=dot_precision(precision))
    return y if b is None else y + b


def pos_embed_hidden(xy: jax.Array, mlp: dict, precision: str = "fp32") -> jax.Array:
    """First half of the pos-embed MLP: linear(2->192)+BN1d(folded)+ReLU
    (fullyConnectedBnLELU_fullyConnected, cpp:461-492).  The second linear
    is folded into the attention projections."""
    prec = dot_precision(precision)
    h = jnp.einsum("pc,cd->pd", xy, mlp["w1"],
                   preferred_element_type=jnp.float32, precision=prec) + mlp["b1"]
    return jnp.maximum(h, 0.0)


def pos_embed_mlp(xy: jax.Array, mlp: dict, precision: str = "fp32") -> jax.Array:
    """Full pos-embed MLP (kept for tests/debug parity)."""
    h = pos_embed_hidden(xy, mlp, precision)
    return _dense(h, mlp["w2"], mlp["b2"], precision)


def _with_dump_row(x: jax.Array) -> jax.Array:
    """[P, C] -> [P+1, C] with a zero dump row (the set_attention debug/
    training helper's table convention; the fast path uses OOB-fill)."""
    return jnp.concatenate([x, jnp.zeros((1, x.shape[-1]), x.dtype)], axis=0)


def _scatter_back(attn_out: jax.Array, canon: jax.Array,
                  n_sets: int, k: int) -> jax.Array:
    """Gather each pillar's canonical set-slot output.  attn_out: [S*Kp, C]
    flat (row = canonical slot at pitch Kp >= K) or [S, K, C]; canon: [P]
    flat slot at pitch K (S*K = dump -> fill 0).  Returns [P, C].

    The fast path hands a FLAT flat kernel output straight to a 1-D row
    gather — when the kernel storage-padded the set dim (K=36 -> Kp=40 for
    sublane alignment, ops/attention.py:_fused_flat_padded), the flat slot
    is remapped to the Kp pitch first (the dump sentinel S*K lands at
    S*Kp: still out of bounds -> fill 0).  The [S, K, C] form (XLA
    fallback paths) uses a 2D (set, slot) gather instead: flattening it
    would force a relayout copy (K = 36 sublane-pads to 40, 1.2 ms/frame
    across the 16 passes in the round-3 trace).  mode="fill" turns the
    dump sentinel into an out-of-bounds fill instead of a concatenated
    zero row (the concat materialized a full-table copy per pass).
    """
    if attn_out.ndim == 2:
        pitch = attn_out.shape[0] // n_sets
        if pitch != k:
            canon = (canon // k) * pitch + canon % k
        return attn_out.at[canon].get(mode="fill", fill_value=0)
    S, K, C = attn_out.shape
    return attn_out.at[canon // K, canon % K].get(mode="fill", fill_value=0)


def backbone3d_forward(pillar_feats: jax.Array,
                       window_parts: Sequence[WindowPartition],
                       set_parts: Sequence[SetPartition],
                       params: dict, cfg: DSVTConfig,
                       precision: str = "fp32",
                       allow_pallas: bool = True) -> jax.Array:
    """pillar_feats: [P, 192] -> [P, 192] after 4 DSVT blocks.

    allow_pallas=False forces the XLA epilogue — required under jax.grad
    (the fused kernel defines no VJP); forward_debug / the training loss
    pass False."""
    eps = cfg.ln_eps

    # pos-embed hidden activations per (block, pass) — computed up front like
    # the reference's 8 embed MLPs (cpp:603-637)
    hidden: List[List[jax.Array]] = []
    for b in range(cfg.num_blocks):
        row = []
        for e in range(2):
            row.append(pos_embed_hidden(window_parts[e].xy_centered,
                                        params["posembed"][b][e], precision))
        hidden.append(row)

    # fused Pallas epilogue (out-proj + LN + FFN + LN + add + LN as ONE
    # kernel, ops/encoder_pallas.py) on the single-device fast paths; the
    # fp32 parity path, training (needs a VJP), and sharded runs keep the
    # XLA formulation
    use_fused = (allow_pallas and cfg.use_pallas
                 and precision in ("bf16", "mixed")
                 and jax.default_backend() == "tpu"
                 and pillar_feats.shape[0] % 8 == 0
                 and constrain_rows(pillar_feats) is pillar_feats)

    x = pillar_feats
    for b in range(cfg.num_blocks):
        sp = set_parts[b % len(set_parts)]
        x_in = x
        for e in range(2):
            enc = params["blocks"][b]["enc"][e]
            mlp = params["posembed"][b][e]
            h1 = hidden[b][e]

            # fold pos-embed linear2 into the q/k projections (module doc),
            # and pack all three projections into ONE [C, 3C] matmul so the
            # attention gather table comes out of a single MXU pass (the
            # per-projection matmuls + downstream concat cost three extra
            # dispatches and a table copy).  The h1 term's v-third is zero
            # weights (~0.7 GFLOP of an 8.5 GFLOP pass) — cheaper than a
            # separate narrower matmul dispatch.
            zero_v = jnp.zeros_like(enc["wv"])
            w_qkv = jnp.concatenate(
                [enc["wq"], enc["wk"], enc["wv"]], axis=1)
            w_pos = jnp.concatenate(
                [mlp["w2"] @ enc["wq"], mlp["w2"] @ enc["wk"], zero_v], axis=1)
            b_qkv = jnp.concatenate(
                [mlp["b2"] @ enc["wq"] + enc["bq"],
                 mlp["b2"] @ enc["wk"] + enc["bk"], enc["bv"]])
            qkv_p = (_dense(x, w_qkv, None, precision)
                     + _dense(h1, w_pos, None, precision) + b_qkv)

            attn = set_attention_qkv(
                qkv_p,
                constrain_rows(sp.inds[e]), constrain_rows(sp.key_mask),
                cfg.num_heads, precision, fused_kernel=use_fused,
                flat_out=use_fused, set_count=sp.set_count)
            n_sets, k_slots = sp.inds[e].shape
            attn_p = _scatter_back(constrain_rows(attn), sp.canon[e],
                                   n_sets, k_slots)

            if use_fused:
                from ..ops.encoder_pallas import encoder_epilogue
                x = encoder_epilogue(x, attn_p, enc, eps)
            else:
                attn_p = _dense(constrain_rows(attn_p), enc["wo"], enc["bo"],
                                precision)
                x1 = layer_norm(x + attn_p, enc["ln1_g"], enc["ln1_b"], eps)
                x2 = layer_norm(x1 + ffn(x1, enc, precision),
                                enc["ln2_g"], enc["ln2_b"], eps)
                x = layer_norm(x2 + x, enc["norm_g"], enc["norm_b"], eps)
        x = layer_norm(x + x_in, params["blocks"][b]["res_g"],
                       params["blocks"][b]["res_b"], eps)
        x = constrain_rows(x)
    return x
