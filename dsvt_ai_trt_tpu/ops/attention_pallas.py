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
tile sits in VMEM, the q/k/v splits happen on registers (no HBM tiling
constraints inside VMEM), the dots run on the MXU in merged-head form
(below), and only the final [BS, K, C] attention output returns to HBM.
HBM traffic per pass drops from ~5 materialized tensors to exactly
read-qkv + write-out.

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
    """One [BS, K, 3C] set block -> [BS, K, C]: all heads' logits in ONE
    [K, C] x [C, H*K] matmul per set via a block-diagonal K/V replication.

    A per-head variant (static unroll over heads, lane-sliced q/k/v,
    2*H batched [36, 24]-shaped dots per set) was the round-3 original —
    each tiny dot uses <6% of an MXU pass (24 of 128 lanes, 36 of 128
    columns), and it traced 1.0 ms/frame slower in the full program
    (dsvt_blocks 5.6 vs 4.6 ms).  Here head h's keys are the rows
    [h*K, (h+1)*K) of a lane-masked [H*K, C] matrix, so q (all heads side
    by side on lanes) against it yields every head's [K, K] logit block
    side by side on the N axis: 2 big MXU dots per set instead of 16 tiny
    ones.  The 8x logit FLOP inflation is irrelevant — the tiny dots
    waste more in padding.  Softmax is stabilized with the exact per-head
    segment max and normalized per segment via two small matmuls
    (e @ seg -> per-head sums, 1/s @ hs -> per-lane reciprocals); no
    Mosaic-unsupported reshapes are involved (there is no [BS, K, H, D]
    shape-cast on TPU, which is also why the XLA head-split layout can't
    be reproduced in-kernel).
    """
    qkv = qkv_ref[:]                      # [BS, K, 3C] bf16
    mask = mask_ref[:]                    # [BS, K] f32 additive
    BS, K, C3 = qkv.shape
    C = C3 // 3
    H = num_heads
    D = C // H
    scale = jnp.float32(1.0) / jnp.sqrt(jnp.float32(D))

    q = qkv[:, :, :C]
    k = qkv[:, :, C:2 * C]
    v = qkv[:, :, 2 * C:]

    # block-diagonal mask [H*K, C]: row h*K+j keeps only head-h lanes
    row_head = jax.lax.broadcasted_iota(jnp.int32, (H * K, C), 0) // K
    lane_head = jax.lax.broadcasted_iota(jnp.int32, (H * K, C), 1) // D
    bd = (row_head == lane_head).astype(k.dtype)

    kt = jnp.concatenate([k] * H, axis=1) * bd[None]   # [BS, H*K, C]
    vt = jnp.concatenate([v] * H, axis=1) * bd[None]

    logits = jax.lax.dot_general(
        q, kt, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)            # [BS, K, H*K]
    km = jnp.concatenate([mask] * H, axis=1)           # [BS, H*K]
    logits = logits * scale + km[:, None, :]

    # exact per-head-segment max stabilizer, expanded back to columns
    m = jnp.concatenate(
        [jnp.broadcast_to(
            jnp.max(logits[:, :, h * K:(h + 1) * K], axis=-1, keepdims=True),
            (BS, K, K)) for h in range(H)], axis=-1)
    e = jnp.exp(logits - m)                            # [BS, K, H*K]

    o = jax.lax.dot_general(
        e.astype(v.dtype), vt, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)            # [BS, K, C]
    # per-head sums -> per-lane reciprocals, both as small matmuls
    seg = (jax.lax.broadcasted_iota(jnp.int32, (H * K, H), 0) // K ==
           jax.lax.broadcasted_iota(jnp.int32, (H * K, H), 1)
           ).astype(jnp.float32)                       # [H*K, H]
    s = jax.lax.dot_general(e, seg, (((2,), (0,)), ((), ())))   # [BS, K, H]
    hs = (jax.lax.broadcasted_iota(jnp.int32, (H, C), 1) // D ==
          jax.lax.broadcasted_iota(jnp.int32, (H, C), 0)
          ).astype(jnp.float32)                        # [H, C]
    r = jax.lax.dot_general(1.0 / s, hs, (((2,), (0,)), ((), ())))
    out_ref[:] = (o * r).astype(out_ref.dtype)


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
