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

This kernel consumes the FLAT gathered packed table directly: a
[BS*K, 3C] tile sits in VMEM, the q/k/v splits happen on registers (no
HBM tiling constraints inside VMEM), the dots run on the MXU in
merged-head form (below), and only the flat [BS*K, C] attention output
returns to HBM — which is exactly the canonical-slot layout the
scatter-back gathers with, so no sublane-padded [S, K, C] tensor ever
exists.  HBM traffic per pass drops from ~5 materialized tensors to
exactly read-qkv + write-out.

Used on the bf16/mixed fast paths; the fp32 parity path and training
keep the XLA formulation (this kernel defines no VJP).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel_flat(qkv_ref, valid_ref, out_ref, *, num_heads: int,
                      k_slots: int, group: int):
    """Flat-layout kernel: [BS*K, 3C] rows in, [BS*K, C] rows out.

    The 3D [S, K, C] tensors around the kernel tile K = 36 to 40 sublanes,
    so the gather->kernel and kernel->scatter-back boundaries each pay a
    relayout copy (~0.5 ms/frame).  This kernel keeps the HBM tensors FLAT
    (row r = set r//K, slot r%K — exactly the canonical-slot convention of
    the scatter-back) and slices per-GROUP inside VMEM.  K-row slices are
    not sublane-aligned (36 % 8 != 0), so sets are processed in groups of
    `group` = 8/gcd(K, 8) whose row count IS aligned.

    Merged-head math: head h's keys are rows of a lane-masked block-
    diagonal [H*G*K, C] matrix, so one [GK, C] x [C, HGK] dot yields every
    (head, set-in-group) [K, K] logit block side by side on the N axis —
    2 big MXU dots per group instead of 2*H tiny [36, 24] dots per set
    (a per-head-unrolled variant traced 1.0 ms/frame slower: each tiny
    dot uses <6% of an MXU pass).  Cross-set logits are killed by a
    STATIC additive quadrant mask; groups larger than the alignment
    minimum were measured and lose (G=4: 1.5x, G=8: 2.7x — the G-fold
    logit FLOP inflation outruns the matmul-size win).

    The key mask is MULTIPLICATIVE here, folded into the V replication and
    the segment-sum selector (columns of dead keys contribute e * 0), with
    validity arriving as a flat [BS*K, 1] 0/1 column — an additive [1, HGK]
    mask row cannot be built in-kernel (assembling it needs a lane-concat
    of K-wide pieces at mixed sublane offsets, which Mosaic rejects:
    "offset mismatch on non-concat dimension").  Exactness: dead columns
    enter the segment max as logit 0 (their gathered k is the OOB zero
    fill), so m >= true max still and softmax shift-invariance keeps
    o/s bit-meaningful; fully-dead segments give s = 0 -> output 0.
    """
    qkv = qkv_ref[:]                      # [BS*K, 3C] bf16
    R, C3 = qkv.shape
    C = C3 // 3
    K = k_slots
    G = group
    H = num_heads
    D = C // H
    GK = G * K
    HGK = H * GK
    scale = jnp.float32(1.0) / jnp.sqrt(jnp.float32(D))

    # static masks (loop-invariant).  Column ordering: c = h*GK + g*K + j.
    lane_head = jax.lax.broadcasted_iota(jnp.int32, (HGK, C), 1) // D
    row_head = jax.lax.broadcasted_iota(jnp.int32, (HGK, C), 0) // GK
    bd = (row_head == lane_head).astype(qkv.dtype)       # [HGK, C]
    qg = jax.lax.broadcasted_iota(jnp.int32, (GK, HGK), 0) // K
    cg = (jax.lax.broadcasted_iota(jnp.int32, (GK, HGK), 1) % GK) // K
    quad = jnp.where(qg == cg, 0.0, jnp.float32(-3.4e38))  # [GK, HGK]
    seg = (jax.lax.broadcasted_iota(jnp.int32, (HGK, G * H), 0) // K ==
           jax.lax.broadcasted_iota(jnp.int32, (HGK, G * H), 1)
           ).astype(jnp.float32)                         # [HGK, (h, g)]
    hs = ((jax.lax.broadcasted_iota(jnp.int32, (G * H, C), 0) // G) ==
          jax.lax.broadcasted_iota(jnp.int32, (G * H, C), 1) // D
          ).astype(jnp.float32)                          # [(h, g), C]

    for p in range(R // GK):
        blk = qkv[p * GK:(p + 1) * GK]                   # [GK, 3C] aligned
        vblk = valid_ref[p * GK:(p + 1) * GK]            # [GK, 1] 0/1 f32
        vcol = jnp.concatenate([vblk] * H, axis=0)       # [HGK, 1]
        q = blk[:, :C]
        kt = jnp.concatenate([blk[:, C:2 * C]] * H, axis=0) * bd   # [HGK, C]
        vt = (jnp.concatenate([blk[:, 2 * C:]] * H, axis=0) * bd
              * vcol.astype(qkv.dtype))

        logits = jax.lax.dot_general(
            q, kt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [GK, HGK]
        logits = logits * scale + quad

        m = jnp.concatenate(
            [jnp.broadcast_to(
                jnp.max(logits[:, s * K:(s + 1) * K], axis=-1, keepdims=True),
                (GK, K)) for s in range(H * G)], axis=-1)
        e = jnp.exp(logits - jnp.maximum(m, jnp.float32(-1e37)))

        o = jax.lax.dot_general(
            e.astype(vt.dtype), vt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [GK, C]
        s = jax.lax.dot_general(e, seg * vcol,
                                (((1,), (0,)), ((), ())))  # [GK, G*H]
        sinv = jnp.where(s > 0.0, 1.0 / s, 0.0)   # dead segments sum to 0
        r = jax.lax.dot_general(sinv, hs, (((1,), (0,)), ((), ())))
        out_ref[p * GK:(p + 1) * GK] = (o * r).astype(out_ref.dtype)


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
def set_attention_fused_flat(qkv_flat: jax.Array, key_mask: jax.Array,
                             num_heads: int,
                             interpret: bool = False) -> jax.Array:
    """Flat-layout variant: qkv_flat [S*K, 3C] (row r = set r//K, slot
    r%K), key_mask [S, K] additive.  Returns [S*K, C] — the canonical-slot
    convention the scatter-back gathers with, so no [S, K, C] tensor (and
    no 36->40 sublane-padding relayout) ever exists in HBM."""
    SK, C3 = qkv_flat.shape
    S, K = key_mask.shape
    C = C3 // 3
    import math
    G = 8 // math.gcd(K, 8)
    bs = _block_sets(S)
    valid = (key_mask >= 0.0).astype(jnp.float32).reshape(S * K, 1)

    return pl.pallas_call(
        functools.partial(_attn_kernel_flat, num_heads=num_heads,
                          k_slots=K, group=G),
        grid=(S // bs,),
        in_specs=[
            pl.BlockSpec((bs * K, C3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bs * K, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bs * K, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((SK, C), qkv_flat.dtype),
        interpret=interpret,
    )(qkv_flat, valid)
