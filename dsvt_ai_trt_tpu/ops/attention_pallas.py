"""Fused set multi-head attention as one Pallas TPU kernel.

The XLA formulation of DSVT's 36-slot set attention
(ops/attention.py:set_attention_qkv) pays ~2 ms/frame of pure data
formatting around ``jax.nn.dot_product_attention``: slicing the packed
[S, K, 3C] gather into q/k/v and reshaping each to [S, K, H, D] puts
D = 24 on the lane axis, which the TPU tiler pads to 128 — every reshape
is a 5.3x-padded relayout copy through HBM, and dpa materializes the
padded [S, H, K, K] probabilities between its two fusions (round-3
trace: 16 dpa fusions at ~0.19 ms + 4 formatting lines at ~0.34 ms per
frame).  Reference analogue: the TRT graph's seven shuffles + two BMMs
around the attention core (src/dsvt-ai-trt.cpp:288-458).

This kernel consumes the gathered packed block directly: a [BS, K, 3C]
tile sits in VMEM, the q/k/v splits and [K, H, D] reshapes happen on
registers (no HBM tiling constraints inside VMEM), the per-(set, head)
[K, D] x [D, K] dots run back-to-back on the MXU, and only the final
[BS, K, C] attention output returns to HBM.  HBM traffic per pass drops
from ~5 materialized tensors to exactly read-qkv + write-out.

Used on the bf16/mixed fast paths; the fp32 parity path and training
keep the XLA formulation (this kernel defines no VJP).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(qkv_ref, mask_ref, out_ref, *, num_heads: int):
    """One [BS, K, 3C] set block -> [BS, K, C] attention output."""
    qkv = qkv_ref[:]                      # [BS, K, 3C] bf16
    mask = mask_ref[:]                    # [BS, K] f32 additive
    BS, K, C3 = qkv.shape
    C = C3 // 3
    H = num_heads
    D = C // H
    scale = jnp.float32(1.0) / jnp.sqrt(jnp.float32(D))

    outs = []
    for h in range(H):                    # static unroll over heads
        # per-head lane slices straight off the packed block: Mosaic has no
        # [BS, K, H, D] shape-cast, but static lane-offset slices lower fine
        qh = qkv[:, :, h * D:(h + 1) * D]             # [BS, K, D]
        kh = qkv[:, :, C + h * D:C + (h + 1) * D]
        vh = qkv[:, :, 2 * C + h * D:2 * C + (h + 1) * D]
        # batched [K, D] x [D, K] per set; f32 accumulation on the MXU
        logits = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)      # [BS, K, K]
        logits = logits * scale + mask[:, None, :]
        logits = logits - jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        oh = jax.lax.dot_general(
            p.astype(vh.dtype), vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)      # [BS, K, D]
        outs.append(oh)
    out = jnp.concatenate(outs, axis=-1)  # [BS, K, C], heads on lanes
    out_ref[:] = out.astype(out_ref.dtype)


def _block_sets(S: int, limit: int = 64) -> int:
    """Largest multiple-of-8 divisor of S that is <= limit (the mask block's
    second-to-last dim must be 8-divisible for the Mosaic tiler)."""
    for cand in range(min(limit, S) - min(limit, S) % 8, 0, -8):
        if S % cand == 0:
            return cand
    return 0


def supported(S: int, K: int, C: int, num_heads: int) -> bool:
    """Shape gate mirrored by callers: needs a sane block divisor and the
    packed-channel layout this kernel assumes."""
    return (C % num_heads == 0 and _block_sets(S) >= 8 and K >= 2)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def set_attention_fused(qkv_g: jax.Array, key_mask: jax.Array,
                        num_heads: int, interpret: bool = False) -> jax.Array:
    """qkv_g: [S, K, 3C] gathered packed q|k|v (bf16 on fast paths);
    key_mask: [S, K] additive (0 valid / -3.4e38 masked).
    Returns [S, K, C] pre-out-projection attention output in qkv_g.dtype."""
    S, K, C3 = qkv_g.shape
    C = C3 // 3
    bs = _block_sets(S)
    row = lambda i: (i, 0, 0)

    return pl.pallas_call(
        functools.partial(_attn_kernel, num_heads=num_heads),
        grid=(S // bs,),
        in_specs=[
            pl.BlockSpec((bs, K, C3), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bs, K, C), row, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, K, C), qkv_g.dtype),
        interpret=interpret,
    )(qkv_g, key_mask.astype(jnp.float32))
