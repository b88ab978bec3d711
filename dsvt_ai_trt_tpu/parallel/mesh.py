"""Device-mesh parallelism for the DSVT pipeline.

The reference is strictly single-GPU, single-stream (SURVEY §2.3: no
NCCL/MPI anywhere; batch hardcoded to 1).  The TPU build treats scaling as
first-class instead:

  * **dp** — data parallel over frames: the whole pipeline is vmapped over
    the batch and the batch axis is sharded across the mesh.  No collectives
    inside a frame; XLA only all-reduces gradients in the training step.
  * **mp** — tensor parallel (Megatron-style) over attention heads and the
    FFN hidden dim: qkv/ffn_w1 column-sharded, out-proj/ffn_w2 row-sharded,
    so each per-encoder pair needs one psum on the row-sharded matmul, which
    XLA's SPMD partitioner inserts from the NamedSharding annotations alone.

Collectives ride ICI via pjit/GSPMD — there is no hand-written comm code,
which is the idiomatic TPU replacement for the reference's (empty)
distributed layer.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import DSVTConfig
from ..model.detector import forward


def make_mesh(dp: int, mp: int = 1, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    assert devices.size >= dp * mp, (devices.size, dp, mp)
    return Mesh(devices[: dp * mp].reshape(dp, mp), ("dp", "mp"))


def param_shardings(params, mesh: Mesh):
    """NamedSharding pytree: TP rules for attention/FFN, replicate the rest."""

    def enc_spec(name: str) -> P:
        col = {"wq", "wk", "wv", "ffn_w1"}
        col_bias = {"bq", "bk", "bv", "ffn_b1"}
        row = {"wo", "ffn_w2"}
        if mesh.shape["mp"] > 1:
            if name in col:
                return P(None, "mp")
            if name in col_bias:
                return P("mp")
            if name in row:
                return P("mp", None)
        return P()

    out = {}
    for top, sub in params.items():
        if top == "blocks":
            out[top] = [
                {
                    "enc": [
                        {k: NamedSharding(mesh, enc_spec(k)) for k in enc}
                        for enc in blk["enc"]
                    ],
                    "res_g": NamedSharding(mesh, P()),
                    "res_b": NamedSharding(mesh, P()),
                }
                for blk in sub
            ]
        else:
            out[top] = jax.tree.map(lambda _: NamedSharding(mesh, P()), sub)
    return out


def shard_params(params, mesh: Mesh):
    return jax.device_put(params, param_shardings(params, mesh))


def batch_forward(params, points: jax.Array, num_points: jax.Array,
                  cfg: DSVTConfig, with_nms: bool = False):
    return jax.vmap(
        lambda p, n: forward(params, p, n, cfg, with_nms))(points, num_points)


def make_dp_engine(params, cfg: DSVTConfig, mesh: Mesh, with_nms: bool = False):
    """Batched, dp-sharded inference function.

    Returns fn(points [B, N, 4], num_points [B]) with B sharded over 'dp'.
    """
    params_d = shard_params(params, mesh)  # captured: cheap dispatch
    data_sharding = NamedSharding(mesh, P("dp"))

    @functools.partial(
        jax.jit,
        in_shardings=(data_sharding, data_sharding),
        out_shardings=NamedSharding(mesh, P("dp")),
    )
    def run(points, num_points):
        return batch_forward(params_d, points, num_points, cfg, with_nms)

    return run
