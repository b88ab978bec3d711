import os

# CPU backend with a virtual 8-device mesh so sharding tests need no TPU.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon TPU plugin's sitecustomize re-exports JAX_PLATFORMS=axon, so the
# env var alone is not enough — force the CPU backend via the config API.
jax.config.update("jax_platforms", "cpu")

# persistent compile cache: the suite's cost is dominated by CPU XLA
# compiles of the full detector at several tiny configs; warm reruns drop
# from ~4 min to well under the 3-min fast-suite budget
from dsvt_ai_trt_tpu.runtime.compile import enable_persistent_cache

enable_persistent_cache("~/.cache/dsvt_tpu_xla_tests")

import time

import numpy as np
import pytest

from dsvt_ai_trt_tpu.config import DSVTConfig, WindowSpec

# Fast-suite wall-clock budget (seconds), enforced as a loud warning: CI
# environments are COLD-cache, so the budget is judged against a cold run
# (`rm -rf ~/.cache/dsvt_tpu_xla_tests`).  Keep `-m "not slow"` under this
# by demoting full-detector compiles to slow, not by deleting coverage.
FAST_BUDGET_S = 240
_t_session = time.time()


def pytest_sessionfinish(session, exitstatus):
    dt = time.time() - _t_session
    markexpr = getattr(session.config.option, "markexpr", "") or ""
    if "not slow" in markexpr and dt > FAST_BUDGET_S:
        import warnings
        warnings.warn(
            f"fast suite took {dt:.0f}s > {FAST_BUDGET_S}s budget "
            f"(cold-cache CI target; demote new detector-compile tests "
            f"to @pytest.mark.slow)", stacklevel=0)
        print(f"\nWARNING: fast suite {dt:.0f}s exceeds the "
              f"{FAST_BUDGET_S}s cold-CI budget")


def tiny_config() -> DSVTConfig:
    """Small config for fast CPU tests; same structure as the default."""
    return DSVTConfig(
        max_points=2048,
        max_kept_points=1536,
        max_pillars=512,
        max_points_per_pillar=8,
        voxel_size=(0.32, 0.32, 8.0),
        pc_range_min=(-7.68, -7.68, -5.0),
        pc_range_max=(7.68, 7.68, 3.0),
        grid_size=(48, 48, 1),
        pfn_channels=(16, 32),  # layer-1 out must equal d_model
        sparse_shape=(48, 48, 1),
        window_specs=(
            WindowSpec(shape=(12, 12, 1), shift=(0, 0, 0)),
            WindowSpec(shape=(24, 24, 1), shift=(6, 6, 0)),
        ),
        max_voxels_per_window=576,
        max_sets=128,
        set_size=12,
        num_blocks=2,
        num_heads=4,
        d_model=32,
        ffn_dim=64,
        num_classes=3,
        top_k=64,
    )


@pytest.fixture(scope="session")
def tiny_cfg() -> DSVTConfig:
    return tiny_config()


@pytest.fixture()
def rng():
    # function-scoped: every test gets the same deterministic stream
    # regardless of which other tests ran before it
    return np.random.default_rng(1234)


def make_cloud(rng, cfg: DSVTConfig, n: int):
    """Random point cloud inside (mostly) the configured range."""
    lo = np.array(cfg.pc_range_min, np.float32)
    hi = np.array(cfg.pc_range_max, np.float32)
    pts = rng.uniform(lo - 0.5, hi + 0.5, size=(n, 3)).astype(np.float32)
    intensity = rng.uniform(0, 1, size=(n, 1)).astype(np.float32)
    cloud = np.concatenate([pts, intensity], axis=1)
    buf = np.zeros((cfg.max_points, 4), np.float32)
    buf[:n] = cloud
    return buf, np.int32(n)
