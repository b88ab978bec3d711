import numpy as np
import jax
import pytest

from dsvt_ai_trt_tpu import weights
from dsvt_ai_trt_tpu.model.detector import forward_jit
from dsvt_ai_trt_tpu.parallel.mesh import make_mesh, make_dp_engine, shard_params
from dsvt_ai_trt_tpu.parallel.training import (make_train_step, random_targets,
                                               batched_loss)

from conftest import make_cloud


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(dp=4, mp=2)


@pytest.mark.slow  # 42 s cold; the per-round dryrun_multichip also exercises dp equality
def test_dp_engine_matches_single_device(tiny_cfg, rng, mesh8):
    cfg = tiny_cfg
    params = weights.random_params(cfg, seed=2)
    batch = 4
    pts = np.stack([make_cloud(rng, cfg, 400 + 50 * i)[0] for i in range(batch)])
    nums = np.array([400 + 50 * i for i in range(batch)], np.int32)

    run = make_dp_engine(params, cfg, mesh8, with_nms=False)
    dets = run(pts, nums)
    for b in range(batch):
        ref = forward_jit(params, pts[b], nums[b], cfg, False)
        assert int(dets.count[b]) == int(ref.count)
        np.testing.assert_allclose(np.asarray(dets.boxes[b]),
                                   np.asarray(ref.boxes), atol=2e-3, rtol=1e-3)


@pytest.mark.slow
def test_train_step_runs_and_reduces_loss(tiny_cfg, rng, mesh8):
    cfg = tiny_cfg
    params = shard_params(weights.random_params(cfg, seed=2), mesh8)
    optimizer, train_step = make_train_step(cfg)
    opt_state = optimizer.init(params)
    batch = 4
    pts = np.stack([make_cloud(rng, cfg, 300)[0] for _ in range(batch)])
    nums = np.full((batch,), 300, np.int32)
    targets = random_targets(rng, cfg, batch)

    step = jax.jit(train_step)
    loss0 = None
    for _ in range(3):
        params, opt_state, loss = step(params, opt_state, pts, nums, targets)
        if loss0 is None:
            loss0 = float(loss)
    assert np.isfinite(float(loss))
    assert float(loss) < loss0  # optimization makes progress


@pytest.mark.slow
def test_gradients_flow_to_all_components(tiny_cfg, rng):
    cfg = tiny_cfg
    params = weights.random_params(cfg, seed=2)
    pts, n = make_cloud(rng, cfg, 300)
    targets = random_targets(rng, cfg, 1)
    grads = jax.grad(lambda p: batched_loss(
        p, pts[None], np.array([n]), targets, cfg))(params)
    # every major component must receive nonzero gradient
    assert np.abs(np.asarray(grads["vfe"]["l0"]["w"])).max() > 0
    assert np.abs(np.asarray(grads["blocks"][0]["enc"][0]["wq"])).max() > 0
    assert np.abs(np.asarray(grads["blocks"][-1]["enc"][1]["ffn_w2"])).max() > 0
    assert np.abs(np.asarray(grads["posembed"][0][0]["w1"])).max() > 0
    assert np.abs(np.asarray(grads["backbone2d"]["stages"][0][0]["conv1_w"])).max() > 0
    assert np.abs(np.asarray(grads["head"]["hm"]["w1"])).max() > 0
