"""Fused DSVT encoder epilogue as one Pallas TPU kernel.

After set attention scatters back to pillar layout, each encoder pass runs

    attn = a @ wo + bo                      (out-projection)
    x1   = LN(x + attn)                     (norm1)
    x2   = LN(x1 + gelu(x1@w1 + b1)@w2+b2)  (FFN + norm2)
    out  = LN(x2 + x)                       (per-encoder norm)

— in XLA that is ~8 separate fusions over [P, 192] per pass, each a
~50-150 us dispatch, × 8 passes (reference graph: dsvt-ai-trt.cpp:648-1120,
LayerNorm plugin + fullyConnected_gelu_fullyConnected).  Here the whole
epilogue is one kernel gridded over pillar-row blocks: the three weight
matrices (~0.3 MB) sit in VMEM, the two FFN matmuls hit the MXU per block,
and every intermediate lives in registers/VMEM instead of round-tripping
HBM.

Used on the bf16/mixed fast paths (inference); the fp32 parity path and
training keep the XLA formulation (the kernel defines no VJP).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import gelu_tanh


def _ln(h, g, b, eps):
    mean = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(h - mean), axis=-1, keepdims=True)
    return (h - mean) * jax.lax.rsqrt(var + eps) * g + b


def _epilogue_kernel(x_ref, a_ref, wo_ref, bo_ref, w1_ref, b1_ref,
                     w2_ref, b2_ref, ln_ref, out_ref, *, eps):
    """One [B, C] row block.  ln_ref: [6, C] = (g1,b1,g2,b2,g3,b3)."""
    x = x_ref[:].astype(jnp.float32)
    a = a_ref[:]

    attn = jnp.dot(a, wo_ref[:], preferred_element_type=jnp.float32)
    attn = attn + bo_ref[:].astype(jnp.float32)

    x1 = _ln(x + attn, ln_ref[0].astype(jnp.float32),
             ln_ref[1].astype(jnp.float32), eps)
    h = jnp.dot(x1.astype(w1_ref.dtype), w1_ref[:],
                preferred_element_type=jnp.float32)
    h = gelu_tanh(h + b1_ref[:].astype(jnp.float32))
    f = jnp.dot(h.astype(w2_ref.dtype), w2_ref[:],
                preferred_element_type=jnp.float32)
    f = f + b2_ref[:].astype(jnp.float32)
    x2 = _ln(x1 + f, ln_ref[2].astype(jnp.float32),
             ln_ref[3].astype(jnp.float32), eps)
    out_ref[:] = _ln(x2 + x, ln_ref[4].astype(jnp.float32),
                     ln_ref[5].astype(jnp.float32), eps)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def encoder_epilogue(x: jax.Array, attn_raw: jax.Array, enc: dict,
                     eps: float = 1e-5, interpret: bool = False) -> jax.Array:
    """x: [P, C] f32 pillar features; attn_raw: [P, C] scattered-back
    attention output (pre out-projection).  Returns [P, C] f32."""
    P, C = x.shape
    dt = attn_raw.dtype
    if P % 8 != 0:
        raise ValueError(f"encoder_epilogue needs P % 8 == 0, got P={P}; "
                         "callers gate on this (backbone3d use_fused)")
    # largest divisor of P that is a multiple of 8 (f32 sublane) and keeps
    # the double-buffered block pair well under the 16 MB VMEM budget
    block = 8
    for cand in range(2048, 7, -8):
        if P % cand == 0:
            block = cand
            break
    # a P with no large aligned divisor (e.g. 8x a prime) would fall back to
    # a P/8-step grid that re-streams the ~0.3 MB weight set every step;
    # instead pad the row count up to a 512 multiple (rows are zero, their
    # outputs are sliced off below) and run with a dense block
    pad = 0
    if block < 64:
        pad = -P % 512
        block = 512
        x = jnp.pad(x, ((0, pad), (0, 0)))
        attn_raw = jnp.pad(attn_raw, ((0, pad), (0, 0)))
        P += pad

    ln = jnp.stack([enc["ln1_g"], enc["ln1_b"], enc["ln2_g"], enc["ln2_b"],
                    enc["norm_g"], enc["norm_b"]]).astype(jnp.float32)
    row = lambda i: (i, 0)
    rep = lambda i: (0, 0)

    return pl.pallas_call(
        functools.partial(_epilogue_kernel, eps=eps),
        grid=(P // block,),
        in_specs=[
            pl.BlockSpec((block, C), row, memory_space=pltpu.VMEM),   # x
            pl.BlockSpec((block, C), row, memory_space=pltpu.VMEM),   # a
            pl.BlockSpec((C, C), rep, memory_space=pltpu.VMEM),       # wo
            pl.BlockSpec((1, C), rep, memory_space=pltpu.VMEM),       # bo
            pl.BlockSpec((C, enc["ffn_w1"].shape[1]), rep,
                         memory_space=pltpu.VMEM),                    # w1
            pl.BlockSpec((1, enc["ffn_w1"].shape[1]), rep,
                         memory_space=pltpu.VMEM),                    # b1
            pl.BlockSpec((enc["ffn_w1"].shape[1], C), rep,
                         memory_space=pltpu.VMEM),                    # w2
            pl.BlockSpec((1, C), rep, memory_space=pltpu.VMEM),       # b2
            pl.BlockSpec((6, C), rep, memory_space=pltpu.VMEM),       # ln
        ],
        out_specs=pl.BlockSpec((block, C), row, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, C), jnp.float32),
        interpret=interpret,
    )(x, attn_raw.astype(dt),
      enc["wo"].astype(dt), enc["bo"][None].astype(jnp.float32),
      enc["ffn_w1"].astype(dt), enc["ffn_b1"][None].astype(jnp.float32),
      enc["ffn_w2"].astype(dt), enc["ffn_b2"][None].astype(jnp.float32),
      ln)[:P - pad]
