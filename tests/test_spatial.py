import numpy as np
import jax
import pytest
from jax.sharding import Mesh

from dsvt_ai_trt_tpu import weights
from dsvt_ai_trt_tpu.model.detector import forward_jit, forward
from dsvt_ai_trt_tpu.parallel.spatial import spatial_sharding

from conftest import make_cloud


@pytest.mark.slow  # ~27 s SPMD compile on 1 CPU core; the driver's
# dryrun_multichip asserts the same sharded-vs-single equivalence at
# flagship dims every round, so the fast suite need not repeat it.
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_spatial_sharding_matches_single_device(tiny_cfg, rng):
    """One frame sharded over the set axis across 8 chips must reproduce the
    single-device result (the collectives GSPMD inserts are semantics-free)."""
    cfg = tiny_cfg
    params = weights.random_params(cfg, seed=5)
    pts, n = make_cloud(rng, cfg, 900)

    ref = forward_jit(params, pts, n, cfg, True)

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("sp",))
    with spatial_sharding(mesh):
        fn = jax.jit(lambda p, x, m: forward(p, x, m, cfg, True))
        got = fn(params, pts, n)

    assert int(got.count) == int(ref.count)
    np.testing.assert_allclose(np.asarray(got.boxes), np.asarray(ref.boxes),
                               atol=2e-3, rtol=1e-3)
