"""Batched set multi-head attention for DSVT, TPU-native.

Replaces the reference's TRT-primitive attention assembly
(src/dsvt-ai-trt.cpp:288-458: seven shuffles, an elementwise divide against a
materialized constant tensor because addScale could not scale by 1/sqrt(d),
and two BMMs over a [sets*heads, 36, 24] layout) with XLA's fused
dot_product_attention over [S, K, H, D] on the bf16/mixed fast paths and a
tile-friendly [Kq, Kk, H, S] einsum layout on the fp32 parity path.  The
downstream epilogue (out-projection + LN + FFN chain) fuses into one
Pallas kernel on TPU (ops/encoder_pallas.py).

Semantics notes:
  * q = k = pillar_feat + pos_embed, v = pillar_feat, gathered by the set's
    global indices (getValueByIndex.cu:282-303).
  * q is scaled by 1/sqrt(head_dim) before qk^T (cpp:397-405 divides by a
    constant sqrt(24) tensor).
  * the additive key mask is broadcast over query positions and heads
    (cpp:376-412: mask reshaped to [sets*heads, 1, K]).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import dot_precision


def _fused_flat_padded(qkv_p: jax.Array, inds: jax.Array, key_mask: jax.Array,
                       num_heads: int, k_pad: int,
                       interpret: bool = False,
                       set_count: jax.Array = None) -> jax.Array:
    """Flat fused-kernel path with the set dim storage-padded K -> k_pad.

    Pad slots gather with mode="clip" (their row values are never observed:
    the padded key-mask columns are -3.4e38, and pad QUERY slots are never
    read back — the canonical-slot gather's flat indices are remapped to
    the k_pad pitch and never land on them, model/backbone3d.py).  "fill"
    mode would lower to a separate [S*Kp, 3C] select pass re-writing the
    whole gather output (traced 0.15 ms/frame).  Returns [S*k_pad, C]."""
    from .attention_pallas import set_attention_fused_flat

    S, K = inds.shape
    if k_pad != K:
        # pad with each set's OWN slot-0 index, NOT the dump sentinel: the
        # pad column's logit then duplicates a live column's (the
        # per-segment softmax max is unchanged) while the -3.4e38 mask
        # column kills its contribution.  A sentinel pad clip-gathers the
        # table's last row — an invalid pillar whose bias-only k can
        # out-logit every live key by >87 nats, underflowing whole heads
        # to the hard-zero path (parity recall 0.93, measured).
        inds = jnp.concatenate(
            [inds, jnp.broadcast_to(inds[:, :1], (S, k_pad - K))], axis=1)
        key_mask = jnp.pad(key_mask, ((0, 0), (0, k_pad - K)),
                           constant_values=jnp.float32(-3.4028235e38))
    qkv_flat = jnp.take(qkv_p, inds.reshape(-1), axis=0, mode="clip")
    return set_attention_fused_flat(qkv_flat, key_mask, num_heads,
                                    interpret=interpret,
                                    set_count=set_count)


def set_attention_qkv(qkv_p: jax.Array, inds: jax.Array, key_mask: jax.Array,
                      num_heads: int, precision: str = "fp32",
                      fused_kernel: bool = False,
                      flat_out: bool = False,
                      set_count: jax.Array = None) -> jax.Array:
    """Masked set attention over pre-projected, PACKED pillar Q/K/V.

    Projections run on the [P, C] pillar arrays (the gather commutes with
    row-wise linears), so the per-set work is just two batched matmuls.
    qkv_p: [P, 3C] = (q | k | v) packed on the channel axis, emitted by one
    fused projection matmul (no dump row — the dump sentinel P gathers
    out-of-bounds and fills 0); inds: [S, K]; returns [S, K, C]
    pre-out-projection attention output — or [S*K, C] (row = canonical
    flat slot) when flat_out=True, which keeps the whole fast path free of
    [S, K, C] tensors (K = 36 tiles to 40 sublanes, so every gather-> and
    ->scatter-back boundary of the 3D layout was a relayout copy,
    ~0.5 ms/frame in the round-3 trace).
    """
    S, K = inds.shape
    C = qkv_p.shape[-1] // 3
    H = num_heads
    D = C // H
    prec = dot_precision(precision)

    # fast paths keep every attention-internal tensor in bf16 with f32
    # accumulation and an f32 softmax — the set-layout gathers dominate the
    # DSVT stage's HBM traffic, and matmul inputs are bf16 on the MXU anyway
    gt = jnp.bfloat16 if precision in ("mixed", "bf16") else jnp.float32

    if (fused_kernel and gt is jnp.bfloat16
            and jax.default_backend() == "tpu"):
        from .attention_pallas import supported
        # storage-pad the set dim K (36) to the sublane tile (40): the
        # padded-K kernel groups ONE set per sublane-aligned block (G=1),
        # which deletes the cross-set quadrant entirely — the G=2 pairing
        # computed (and exp'd) 2x the live logits.  The 4 dead slots ride
        # the gather (+11% rows) and die under the key mask; Eq.(3) set
        # semantics stay K=36 upstream (ops/windows.py).
        Kp = -(-K // 8) * 8
        if flat_out and supported(S, Kp, C, H):
            out = _fused_flat_padded(qkv_p.astype(gt), inds, key_mask, H, Kp,
                                     set_count=set_count)
            return out  # [S*Kp, C]: caller derives the slot pitch Kp
        if supported(S, K, C, H):
            # 3D-output form for callers that need [S, K, C]
            from .attention_pallas import set_attention_fused_flat
            qkv_flat = jnp.take(qkv_p.astype(gt), inds.reshape(-1), axis=0,
                                mode="clip")
            out = set_attention_fused_flat(qkv_flat, key_mask, H,
                                           set_count=set_count)
            return out.reshape(S, K, C)

    # ONE wide gather instead of three: TPU row-gather cost is per-row
    # (latency-bound — a 3x wider row costs ~1.2x, measured), so the set
    # gather reads the packed [P, 3C] table once.  The dump slot is an
    # out-of-bounds FILL, not a concatenated zero row (the concat cost a
    # full-table copy per pass).  NOTE: gathering from a pre-head-split
    # [P, 3, H, D] table (to make the q/k/v splits free) was measured FAR
    # worse (+8 ms/frame): D=24 lane-pads to 128, and the gather pays the
    # 5.3x-padded row bytes — keep the compact table and pay the three
    # slice-reshapes below instead.
    qkv = jnp.take(qkv_p.astype(gt), inds, axis=0, mode="fill", fill_value=0)

    q = qkv[..., :C].reshape(S, K, H, D)
    k = qkv[..., C:2 * C].reshape(S, K, H, D)
    v = qkv[..., 2 * C:].reshape(S, K, H, D)

    if gt is jnp.bfloat16:
        # XLA's fused attention path.  Three alternatives measured worse
        # end-to-end: a Pallas grouped-dot kernel (+9 ms, removed), the
        # fp32-style [Kq,Kk,H,S] einsum layout below (+5 ms nuScenes /
        # +13 ms Waymo despite avoiding the padded [S,H,36,36] logits —
        # the (8,S)-minor batched matmuls tile worse than dpa's layout).
        # (Chunking the set axis into <=800-set dpa calls also measured
        # FAR worse — 127 vs 81 ms at Waymo: the chunk slices break the
        # gather+attention fusion and force materialized copies.)
        out = jax.nn.dot_product_attention(
            q, k, v, bias=key_mask[:, None, None, :])
        return out.reshape(S * K, C) if flat_out else out.reshape(S, K, C)

    # strict fp32 parity path: logits as [Kq, Kk, H, S] so the minor dims
    # are (H, S) — the natural [S, H, Kq, Kk] layout tile-pads the trailing
    # (36, 36) to (40, 128), a ~4x blow-up on the biggest DSVT buffer.
    scale = jnp.asarray(1.0, gt) / jnp.sqrt(jnp.asarray(D, gt))
    logits = jnp.einsum("sqhd,skhd->qkhs", q * scale, k,
                        preferred_element_type=jnp.float32, precision=prec)
    logits = logits + jnp.transpose(key_mask)[None, :, None, :]
    attn = jax.nn.softmax(logits, axis=1)
    out = jnp.einsum("qkhs,skhd->qshd", attn.astype(gt), v,
                     preferred_element_type=jnp.float32, precision=prec)
    out = jnp.transpose(out, (1, 0, 2, 3))
    out = out.reshape(S * K, C) if flat_out else out.reshape(S, K, C)
    return out.astype(gt)


def set_attention(feats: jax.Array, pos: jax.Array, inds: jax.Array,
                  key_mask: jax.Array, enc: dict, num_heads: int,
                  precision: str = "fp32") -> jax.Array:
    """One masked set-attention pass.

    feats:    [P+1, C] pillar features with a zero dump row at index P.
    pos:      [P+1, C] positional embedding (same dump row convention).
    inds:     [S, K] global pillar index per set slot.
    key_mask: [S, K] additive mask (0 / -3.4e38).
    enc:      weights dict (wq,bq,wk,bk,wv,bv,wo,bo).
    Returns:  [S, K, C] attention output (pre scatter-back).
    """
    S, K = inds.shape
    C = feats.shape[-1]
    H = num_heads
    D = C // H

    g_feat = feats[inds]                       # [S, K, C]
    g_pos = pos[inds]
    qk_in = g_feat + g_pos

    dt = jnp.bfloat16 if precision == "bf16" else jnp.float32
    qk_in = qk_in.astype(dt)
    v_in = g_feat.astype(dt)

    prec = dot_precision(precision)

    def proj(xm, w, b):
        y = jnp.einsum("skc,cd->skd", xm, w.astype(dt),
                       preferred_element_type=jnp.float32, precision=prec)
        return y + b

    q = proj(qk_in, enc["wq"], enc["bq"]).reshape(S, K, H, D)
    k = proj(qk_in, enc["wk"], enc["bk"]).reshape(S, K, H, D)
    v = proj(v_in, enc["wv"], enc["bv"]).reshape(S, K, H, D)

    scale = 1.0 / jnp.sqrt(jnp.float32(D))
    logits = jnp.einsum("sqhd,skhd->shqk", (q * scale).astype(dt), k.astype(dt),
                        preferred_element_type=jnp.float32, precision=prec)
    logits = logits + key_mask[:, None, None, :]
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("shqk,skhd->sqhd", attn.astype(dt), v.astype(dt),
                     preferred_element_type=jnp.float32, precision=prec)
    out = out.reshape(S, K, C)
    out = jnp.einsum("skc,cd->skd", out.astype(dt), enc["wo"].astype(dt),
                     preferred_element_type=jnp.float32, precision=prec) + enc["bo"]
    return out


def layer_norm(x: jax.Array, gamma: jax.Array, beta: jax.Array,
               eps: float) -> jax.Array:
    """Channel layer norm (layerNorm.cu:261-338; population variance)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * gamma + beta


def gelu_tanh(x: jax.Array) -> jax.Array:
    """tanh-approx GELU with the reference's constants (gelu.cu:201-210,
    params.h:75-77): 0.5*x*(1 + tanh(x*(B + C*x^2)))."""
    a, b, c = 0.5, 0.7978845608028654, 0.035677408136300125
    return (a + a * jnp.tanh(x * (c * x * x + b))) * x


def ffn(x: jax.Array, enc: dict, precision: str = "fp32") -> jax.Array:
    """linear1 -> GELU -> linear2 (fullyConnected_gelu_fullyConnected,
    cpp:494-529).  Fast paths keep the 2x-wide hidden activations in bf16."""
    dt = jnp.bfloat16 if precision in ("mixed", "bf16") else jnp.float32
    prec = dot_precision(precision)
    h = jnp.einsum("pc,cd->pd", x.astype(dt), enc["ffn_w1"].astype(dt),
                   preferred_element_type=jnp.float32, precision=prec) + enc["ffn_b1"]
    h = gelu_tanh(h).astype(dt)
    return jnp.einsum("pc,cd->pd", h, enc["ffn_w2"].astype(dt),
                      preferred_element_type=jnp.float32, precision=prec) + enc["ffn_b2"]
