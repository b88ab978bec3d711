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


def _attn_kernel_pairs(count_ref, qkv_ref, valid_ref, out_ref, *,
                       num_heads: int, k_slots: int, group: int,
                       block_sets: int):
    """Occupancy gate: sets with id >= set_count are invalid — SetPartition
    emits ALL-dead key masks for them (ops/windows.py:set_partition), so the
    ungated dead-segment math hands them exact zeros.  Blocks made ONLY of
    such sets skip the MXU/VPU work entirely and
    memset their output block instead — identical results, and the per-call
    cost becomes proportional to ceil(count/BS) instead of S/BS (Waymo runs
    S=1024 at 599/416 occupancy: ~40% of every attention pass was padding).
    Dead blocks' input DMAs are killed too: their BlockSpec index remaps to
    block 0 (_gated_index), so consecutive dead steps present the same
    index and the pipeline skips the copy."""
    live = pl.program_id(0) * block_sets < count_ref[0]

    @pl.when(jnp.logical_not(live))
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(live)
    def _body():
        _attn_block_math(qkv_ref, valid_ref, out_ref, num_heads=num_heads,
                         k_slots=k_slots, group=group)


def _gated_index(i, count_ref, block_sets: int):
    """BlockSpec index for the inputs: dead blocks (every set in the block
    >= set_count) remap to resident block 0, so Pallas's pipeline sees the
    same index as the previous dead step and SKIPS their input DMA (the
    kernel never reads inputs on the dead path).  Round-4 note said "the
    input DMA still runs for skipped blocks" — this kills it: Waymo runs
    S=1024 at ~600/416 live sets, so ~40% of the qkv stream per pass was
    DMA'd only to be ignored.  Outputs keep the identity map: dead blocks
    must still WRITE their zeros (the [count:, :] slots are contractually
    zero, tests/test_attention_pallas.py)."""
    return jnp.where(i * block_sets < count_ref[0], i, 0)


def _attn_block_math(qkv_ref, valid_ref, out_ref, *, num_heads: int,
                     k_slots: int, group: int):
    """Merged-head set attention over a flat canonical-slot stream.

    Layout: the [S*K, 3C] gather is viewed as [S/G, G*K, 3C] with
    G = 8/gcd(K, 8) sets per group — G*K is sublane-aligned, so the 3D
    view is a BITCAST of the flat layout (the natural [S, K, *] view tiles
    K = 36 to 40 sublanes and every boundary paid a relayout copy).  The
    per-group math runs as Mosaic batched dots over the whole block; a
    per-group Python unroll traced ~25% slower.

    Merged heads: head h's keys for the group are rows [h*GK, (h+1)*GK)
    of a lane-masked block-diagonal [H*G*K, C] matrix, so ONE batched
    [GK, C] x [C, HGK] dot yields every (head, set) [K, K] logit block
    side by side on the N axis — vs 2*H tiny [36, 24] dots per set, each
    using <6% of an MXU pass (traced 1.0 ms/frame slower).  Cross-set
    logits die under a STATIC additive quadrant mask; larger groups were
    measured and lose (G=4: 1.5x, G=8: 2.7x — the G-fold logit FLOP
    inflation outruns the matmul-size win).

    The key mask is MULTIPLICATIVE, folded into the V replication and the
    segment-sum selector (dead-key columns contribute e * 0), with
    validity arriving as a [.., G*K, 1] 0/1 column — an additive [1, HGK]
    mask row cannot be assembled in-kernel (lane-concat of K-wide pieces
    at mixed sublane offsets; Mosaic rejects it).  Exactness: dead columns
    enter the per-segment max with whatever logit their clip-gathered k row
    produces (ops/attention.py gathers with mode="clip"), so m >= true max
    over the segment and softmax shift-invariance holds; fully-dead
    segments give s = 0 -> output exactly 0 (all-masked sets hard-zero).
    The max must stay per-(head, set): one row-global shift makes every
    head share the best head's scale, and real cross-head logit spread
    underflowed whole heads to zero (parity recall 0.49 — measured, do not
    retry); placing the segment maxes by an MXU dot with ``seg`` also
    loses (f32 dots go through bf16 splitting, and the result traced
    0.035 ms/call SLOWER than this concat+broadcast build).
    """
    qkv = qkv_ref[:]                      # [B, GK, 3C] bf16
    vld = valid_ref[:]                    # [B, GK, 1] f32 0/1
    B, GK, C3 = qkv.shape
    C = C3 // 3
    K = k_slots
    G = group
    H = num_heads
    D = C // H
    HGK = H * GK
    scale = jnp.float32(1.0) / jnp.sqrt(jnp.float32(D))

    # static masks; column/row ordering c = h*GK + g*K + j (as in the flat
    # kernel)
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

    q = qkv[:, :, :C]
    kt = jnp.concatenate([qkv[:, :, C:2 * C]] * H, axis=1) * bd[None]
    vcol = jnp.concatenate([vld] * H, axis=1)              # [B, HGK, 1]
    vt = (jnp.concatenate([qkv[:, :, 2 * C:]] * H, axis=1) * bd[None]
          * vcol.astype(qkv.dtype))

    logits = jax.lax.dot_general(
        q, kt, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # [B, GK, HGK]
    logits = logits * scale + quad[None]

    m = jnp.concatenate(
        [jnp.broadcast_to(
            jnp.max(logits[:, :, s * K:(s + 1) * K], axis=-1, keepdims=True),
            (B, GK, K)) for s in range(H * G)], axis=-1)
    e = jnp.exp(logits - jnp.maximum(m, jnp.float32(-1e37)))

    o = jax.lax.dot_general(
        e.astype(vt.dtype), vt, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # [B, GK, C]
    s = jax.lax.dot_general(e, seg[None] * vcol,
                            (((2,), (1,)), ((0,), (0,))))  # [B, GK, G*H]
    sinv = jnp.where(s > 0.0, 1.0 / s, 0.0)
    r = jax.lax.dot_general(sinv, hs, (((2,), (0,)), ((), ())))
    out_ref[:] = (o * r).astype(out_ref.dtype)


def _block_sets(S: int, limit: int = 32) -> int:
    """Largest multiple-of-8 divisor of S that is <= limit (the mask block's
    second-to-last dim must be 8-divisible for the Mosaic tiler; the limit
    bounds the kernel's live VMEM — 64-set blocks at Waymo's S=1024 put the
    scoped stack at 21 MB vs the 16 MB limit; 32 traced marginally ahead of
    40 at the K=40/G=1 geometry and is safe at both configs)."""
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
                             interpret: bool = False,
                             set_count: jax.Array = None) -> jax.Array:
    """Flat-layout entry: qkv_flat [S*K, 3C] (row r = set r//K, slot r%K),
    key_mask [S, K] additive.  Returns [S*K, C] — the canonical-slot
    convention the scatter-back gathers with, so no sublane-padded
    [S, K, C] tensor ever exists in HBM (the [S/G, G*K, *] views passed to
    the kernel have an 8-aligned second-minor dim: pure bitcasts).

    set_count (scalar int32, optional): number of valid sets; blocks made
    only of sets >= set_count skip their compute and write zeros — exactly
    what the dead-segment math produced for them (kernel docstring)."""
    SK, C3 = qkv_flat.shape
    S, K = key_mask.shape
    C = C3 // 3
    import math
    G = 8 // math.gcd(K, 8)
    bs = _block_sets(S)
    valid = (key_mask >= 0.0).astype(jnp.float32)
    if set_count is None:
        set_count = jnp.int32(S)
    count = jnp.asarray(set_count, jnp.int32).reshape(1)

    B = S // G
    out = pl.pallas_call(
        functools.partial(_attn_kernel_pairs, num_heads=num_heads,
                          k_slots=K, group=G, block_sets=bs),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(S // bs,),
            in_specs=[
                pl.BlockSpec((bs // G, G * K, C3),
                             lambda i, c: (_gated_index(i, c, bs), 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bs // G, G * K, 1),
                             lambda i, c: (_gated_index(i, c, bs), 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bs // G, G * K, C), lambda i, c: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((B, G * K, C), qkv_flat.dtype),
        interpret=interpret,
    )(count, qkv_flat.reshape(B, G * K, C3), valid.reshape(B, G * K, 1))
    return out.reshape(SK, C)
