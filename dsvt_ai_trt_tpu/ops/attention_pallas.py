"""Fused Pallas TPU kernel for DSVT set attention.

The XLA formulations of the per-set masked MHA (ops/attention.py) are
~100x off roofline on TPU: 6400 independent [36, 24] @ [24, 36] matmuls per
frame-pass batch terribly on the MXU, and every layout choice either
tile-pads the [36, 36] logits ~4x or round-trips padded buffers through HBM.

This kernel restructures the computation so every dot is a plain 2D matmul
(Mosaic's one fast path — batched `dot_general` SIGABRTs the TPU compiler,
and unaligned lane slicing is unsupported):

  * sets are processed in groups of ``BS`` (8) per grid step, flattening the
    group's [BS, K, D] Q/K/V to [BS*K, D] rows (pre-flattened outside the
    kernel — an in-kernel [BS, K, D] -> [BS*K, D] reshape is not
    sublane-aligned for K=36 and fails to lower);
  * one [BS*K, BS*K] dot per (group, head) computes all same-group logits;
    cross-set products are additive-masked with a medium penalty (-1e30) so
    a fully-masked padding row softmaxes onto cross-set columns instead of
    producing -inf - (-inf) = NaN;
  * the per-set key mask (0 / -3.4e38, getSet.cu:541-566 semantics) arrives
    pre-flattened per group ([S/BS, 1, BS*K]) so the kernel adds it as a
    [1, BS*K] row vector without any sublane->lane reshape;
  * the head dim D=24 tile-pads to 128 lanes in VMEM (5.3x), so the grid
    blocks over groups — each step's windows are ~0.6 MB and double-buffer
    against the 16 MXU dots of that step.

Layout contract: q/k/v arrive as [S, K, C]; scale 1/sqrt(D) is applied to
the f32 logits (algebraically identical to the reference's q / sqrt(24),
dsvt-ai-trt.cpp:397-405, and more accurate than scaling bf16 q).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

BS = 8                  # sets per flattened dot group (one grid step)
CROSS_PENALTY = -1e30   # cross-set logit mask; see module docstring


def _kernel(q_ref, k_ref, v_ref, m_ref, o_ref, *, num_heads, k_per_set):
    """Refs per step: q/k/v/o [H, BS*K, D] bf16; m [1, 1, BS*K] f32."""
    H, K = num_heads, k_per_set
    R = BS * K

    ri = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0) // K
    ci = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1) // K
    cross = jnp.where(ri == ci, 0.0, CROSS_PENALTY).astype(jnp.float32)
    scale = jnp.float32(1.0) / jnp.sqrt(jnp.float32(q_ref.shape[-1]))
    mrow = m_ref[0]                           # [1, R] f32

    for h in range(H):
        q2 = q_ref[h]                         # [R, D] bf16
        k2 = k_ref[h]
        v2 = v_ref[h]
        lg = jax.lax.dot_general(q2, k2, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        lg = lg * scale + mrow + cross
        p = jax.nn.softmax(lg, axis=-1).astype(jnp.bfloat16)
        out = jax.lax.dot_general(p, v2, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        o_ref[h] = out.astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def set_attention_pallas(q: jax.Array, k: jax.Array, v: jax.Array,
                         key_mask: jax.Array, num_heads: int,
                         interpret: bool = False) -> jax.Array:
    """Masked per-set MHA.  q/k/v: [S, K, C] (q unscaled);
    key_mask: [S, K] f32 additive.  Returns [S, K, C] bf16."""
    S, K, C = q.shape
    H = num_heads
    D = C // H
    R = BS * K
    assert S % BS == 0, (S, BS)
    n_groups = S // BS

    def split(x):
        # [S, K, C] -> head-split, row-flattened [H, S*K, D]
        return (x.reshape(S, K, H, D).transpose(2, 0, 1, 3)
                .reshape(H, S * K, D).astype(jnp.bfloat16))

    m3 = key_mask.astype(jnp.float32).reshape(n_groups, 1, R)
    qkv_spec = pl.BlockSpec((H, R, D), lambda i: (0, i, 0))
    o3 = pl.pallas_call(
        functools.partial(_kernel, num_heads=H, k_per_set=K),
        grid=(n_groups,),
        in_specs=[qkv_spec, qkv_spec, qkv_spec,
                  pl.BlockSpec((1, 1, R), lambda i: (i, 0, 0))],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((H, S * K, D), jnp.bfloat16),
        interpret=interpret,
    )(split(q), split(k), split(v), m3)
    return o3.reshape(H, S, K, D).transpose(1, 2, 0, 3).reshape(S, K, C)
