"""Engine build / load: the reference's -s / -d split, TPU-native.

The reference serializes a TensorRT engine to disk and deserializes it for
inference (dsvt-ai-trt.cpp:1764-1822).  The XLA analogue is two-level:

  * ``build_engine`` AOT-lowers and serializes the jitted forward pass with
    jax.export (a portable compiled-artifact blob, our ``.engine``);
  * a persistent XLA compilation cache makes even the JIT path warm-start
    (the second-level artifact cache, like the reference's build-once flow).
"""

from __future__ import annotations

import functools
import logging
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DSVTConfig
from ..model.detector import forward

log = logging.getLogger("dsvt_tpu.compile")


def enable_persistent_cache(path: str = "~/.cache/dsvt_tpu_xla") -> None:
    path = os.path.expanduser(path)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _abstract_inputs(cfg: DSVTConfig):
    points = jax.ShapeDtypeStruct((cfg.max_points, 4), jnp.float32)
    num = jax.ShapeDtypeStruct((), jnp.int32)
    return points, num


def _register_serializable_types() -> None:
    from jax import export
    from ..ops.postprocess import Detections

    try:
        export.register_namedtuple_serialization(
            Detections, serialized_name="dsvt_tpu.Detections")
    except ValueError:
        pass  # already registered


# engine artifact header: magic + config stamp, so a deserialized engine can
# never silently run with different semantics than the caller expects (the
# reference has the same hazard: nothing ties se-ssd-spp.engine to params.h).
_ENGINE_MAGIC = b"DSVTTPU1"


def _stamp(cfg: DSVTConfig, with_nms: bool) -> bytes:
    import json
    meta = json.dumps({"config": json.loads(cfg.to_json()),
                       "with_nms": with_nms}).encode()
    return _ENGINE_MAGIC + len(meta).to_bytes(4, "little") + meta


def _split_stamp(blob: bytes):
    import json
    if not blob.startswith(_ENGINE_MAGIC):
        return None, blob  # legacy unstamped artifact
    n = int.from_bytes(blob[8:12], "little")
    meta = json.loads(blob[12:12 + n].decode())
    return meta, blob[12 + n:]


def build_engine(params, cfg: DSVTConfig, path: Optional[str] = None,
                 with_nms: bool = True) -> bytes:
    """AOT-compile the full forward pass and serialize it (the -s path)."""
    from jax import export

    _register_serializable_types()

    fn = jax.jit(functools.partial(forward, cfg=cfg, with_nms=with_nms))
    points, num = _abstract_inputs(cfg)
    t0 = time.time()
    exported = export.export(fn)(params, points, num)
    blob = _stamp(cfg, with_nms) + exported.serialize()
    log.info("engine build: %.1fs, %d bytes", time.time() - t0, len(blob))
    if path:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def load_engine(path_or_blob, expect_cfg: Optional[DSVTConfig] = None,
                expect_nms: Optional[bool] = None) -> "jax.export.Exported":
    """Deserialize a built engine (the -d path).

    When `expect_cfg`/`expect_nms` are given, the config stamped into the
    artifact at build time must match, else ValueError — a deserialized
    engine can't silently run with stale semantics.
    """
    from jax import export

    _register_serializable_types()
    blob = path_or_blob
    if isinstance(path_or_blob, str):
        with open(path_or_blob, "rb") as f:
            blob = f.read()
    meta, blob = _split_stamp(blob)
    if meta is not None:
        if expect_cfg is not None:
            import json
            built = DSVTConfig.from_json(json.dumps(meta["config"]))
            if built != expect_cfg:
                diffs = [f for f in built.__dataclass_fields__
                         if getattr(built, f) != getattr(expect_cfg, f)]
                raise ValueError(
                    f"engine was built with a different config (fields {diffs}); "
                    "rebuild it or pass the matching DSVTConfig")
        if expect_nms is not None and meta["with_nms"] != expect_nms:
            raise ValueError(
                f"engine was built with with_nms={meta['with_nms']}, "
                f"caller expects {expect_nms}")
    elif expect_cfg is not None or expect_nms is not None:
        log.warning("engine artifact has no config stamp (pre-r2 build); "
                    "cannot verify settings")
    return export.deserialize(blob)


class Engine:
    """Callable wrapper: boxes, count = engine(points, num_points).

    Weights are *captured* by the jitted callable rather than passed per
    call: dispatch cost on tunneled TPU runtimes scales with the number of
    argument leaves (~3.5 ms/leaf measured — 258 weight leaves cost ~900 ms
    per call as arguments, ~0 captured).  Falls back to a serialized
    jax.export artifact when given one.
    """

    def __init__(self, params, cfg: DSVTConfig, engine_path: Optional[str] = None,
                 with_nms: bool = True):
        self.cfg = cfg
        self.params = jax.device_put(params)
        if engine_path and os.path.exists(engine_path):
            exported = load_engine(engine_path, expect_cfg=cfg,
                                   expect_nms=with_nms)
            self._call = functools.partial(exported.call, self.params)
            log.info("loaded engine from %s", engine_path)
        else:
            params_d = self.params
            self._call = jax.jit(
                lambda pts, n: forward(params_d, pts, n, cfg, with_nms))

    def __call__(self, points, num_points):
        return self._call(points, num_points)

    def warmup(self):
        points = jnp.zeros((self.cfg.max_points, 4), jnp.float32)
        dets = self(points, jnp.int32(0))
        jax.block_until_ready(dets)
        return self
