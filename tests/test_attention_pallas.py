"""Fused Pallas set-attention kernel vs the XLA dpa formulation.

The flat kernel (ops/attention_pallas.py) must be algebraically identical
to set_attention_qkv's bf16 fast path — same packed-qkv input contract
(flat [S*K, 3C], row = canonical slot), same key-mask semantics, same
all-masked-set zero output.  Runs in interpret mode (CPU suite); the
device path is exercised by bench and by tools/parity_check.py (exact-
top-k box parity stays 1.0 with the kernel on, verified on TPU v5e).
"""

import numpy as np
import jax
import jax.numpy as jnp

from dsvt_ai_trt_tpu.ops.attention import set_attention_qkv
from dsvt_ai_trt_tpu.ops.attention_pallas import (set_attention_fused_flat,
                                                  supported, _block_sets)


def _mk(rng, P, C, S, K):
    qkv_p = rng.normal(0, 1, (P, 3 * C)).astype(np.float32)
    inds = rng.integers(0, P + 1, (S, K)).astype(np.int32)  # P == dump
    mask = np.where(inds < P, 0.0, -3.4028235e38).astype(np.float32)
    return qkv_p, inds, mask


def _run_flat(qkv_p, inds, mask, H, S, K, C):
    qkv_g = jnp.take(jnp.asarray(qkv_p).astype(jnp.bfloat16),
                     jnp.asarray(inds).reshape(-1), axis=0,
                     mode="fill", fill_value=0)
    out = set_attention_fused_flat(qkv_g, jnp.asarray(mask), H,
                                   interpret=True)
    return np.asarray(out).astype(np.float32).reshape(S, K, C)


def test_fused_matches_dpa_path(rng):
    P, C, H, S, K = 500, 192, 8, 80, 36
    qkv_p, inds, mask = _mk(rng, P, C, S, K)
    inds[3] = P  # one fully-masked set
    mask[3] = -3.4028235e38

    ref = np.asarray(set_attention_qkv(
        jnp.asarray(qkv_p), jnp.asarray(inds), jnp.asarray(mask), H,
        "bf16")).astype(np.float32)
    got = _run_flat(qkv_p, inds, mask, H, S, K, C)

    # both paths run bf16 matmuls with f32 softmax; disagreement on VALID
    # slots is bf16 rounding noise only (dead slots: the kernel hard-zeros
    # fully-dead segments, the dpa path averages the zero-filled v rows)
    valid = mask == 0.0
    np.testing.assert_allclose(got[valid], ref[valid], atol=5e-3, rtol=2e-2)
    assert np.all(got[3] == 0.0)  # fully-masked set stays zero


def test_fused_masked_slot_isolation(rng):
    """A masked slot's pillar must not leak into other outputs.

    The kernel's key mask is multiplicative (folded into V and the
    segment sums), so a masked slot's V row is excluded EXACTLY; its K row
    can only perturb the shared softmax stabilizer, which is a no-op in
    exact arithmetic (shift invariance) and rounding-level in bf16.  In
    the real pipeline masked slots always carry the OOB dump index (their
    gathered row is the zero fill), so even that path is inert.
    """
    P, C, H, S, K = 100, 192, 8, 8, 36
    qkv_p, inds, mask = _mk(rng, P, C, S, K)
    mask[0, 5] = -3.4028235e38
    victim = inds[0, 5]
    # make the victim pillar appear nowhere else
    inds[(inds == victim) & (mask == 0.0)] = P

    def run(q):
        return _run_flat(q, inds, mask, H, S, K, C)

    out1 = run(qkv_p)
    keep = mask[0] == 0.0

    # v-perturbation of the masked slot: excluded exactly
    qkv_v = qkv_p.copy()
    qkv_v[victim, 2 * C:] += 5.0
    np.testing.assert_allclose(run(qkv_v)[0][keep], out1[0][keep],
                               atol=1e-6)

    # k-perturbation: stabilizer-only effect, bounded by rounding noise
    qkv_k = qkv_p.copy()
    qkv_k[victim, C:2 * C] += 5.0
    np.testing.assert_allclose(run(qkv_k)[0][keep], out1[0][keep],
                               atol=2e-2, rtol=2e-2)


def test_padded_k_flat_path_matches_dpa(rng):
    """The K=36 -> Kp=40 storage-padded fast path (ops/attention.py:
    _fused_flat_padded, G=1 kernel geometry) + the Kp-pitch canon remap
    must reproduce the dpa path on every live canonical slot."""
    from dsvt_ai_trt_tpu.ops.attention import _fused_flat_padded
    from dsvt_ai_trt_tpu.model.backbone3d import _scatter_back

    P, C, H, S, K = 500, 192, 8, 80, 36
    Kp = 40
    qkv_p, inds, mask = _mk(rng, P, C, S, K)
    inds[3] = P
    mask[3] = -3.4028235e38
    assert supported(S, Kp, C, H)

    flat = _fused_flat_padded(jnp.asarray(qkv_p).astype(jnp.bfloat16),
                              jnp.asarray(inds), jnp.asarray(mask), H, Kp,
                              interpret=True)
    assert flat.shape == (S * Kp, C)

    ref = np.asarray(set_attention_qkv(
        jnp.asarray(qkv_p), jnp.asarray(inds), jnp.asarray(mask), H,
        "bf16")).astype(np.float32)

    # every live (set, slot) read through the pitch-remapping scatter-back
    sets, slots = np.nonzero(mask == 0.0)
    canon = (sets * K + slots).astype(np.int32)
    got = np.asarray(_scatter_back(flat, jnp.asarray(canon), S, K))
    np.testing.assert_allclose(got.astype(np.float32),
                               ref[sets, slots], atol=5e-3, rtol=2e-2)

    # dump sentinel S*K must fill 0 through the remap
    dump = np.asarray(_scatter_back(flat, jnp.asarray([S * K], np.int32),
                                    S, K))
    assert np.all(dump == 0.0)


def test_set_count_gate_matches_full(rng):
    """Blocks past set_count skip compute and write zeros — identical to
    the ungated kernel because sets >= count carry all-dead key masks (the
    SetPartition contract, ops/windows.py:set_partition key_mask build;
    pinned for the real partition by
    test_windows.test_invalid_sets_carry_dead_masks)."""
    P, C, H, S, K = 300, 64, 4, 64, 8
    for count in (19, 0, 64):        # block-straddling, all-dead, all-live
        qkv_p, inds, mask = _mk(rng, P, C, S, K)
        inds[count:] = P
        mask[count:] = -3.4028235e38
        qkv_g = jnp.take(jnp.asarray(qkv_p).astype(jnp.bfloat16),
                         jnp.asarray(inds).reshape(-1), axis=0,
                         mode="fill", fill_value=0)
        full = np.asarray(set_attention_fused_flat(
            qkv_g, jnp.asarray(mask), H, interpret=True))
        gated = np.asarray(set_attention_fused_flat(
            qkv_g, jnp.asarray(mask), H, interpret=True,
            set_count=jnp.int32(count)))
        np.testing.assert_array_equal(gated, full)
        assert np.all(gated.reshape(S, K, C)[count:] == 0)


def test_block_divisor_rules():
    assert _block_sets(800) == 32        # multiple of 8, divides 800, <= 32
    assert _block_sets(1024) == 32       # VMEM-bounded (Waymo shapes)
    assert _block_sets(8) == 8
    assert _block_sets(7) == 0           # no aligned divisor -> unsupported
    assert supported(800, 36, 192, 8)
    assert not supported(7, 36, 192, 8)
    assert not supported(800, 36, 100, 8)  # C not divisible by heads
