import numpy as np
import jax.numpy as jnp

from dsvt_ai_trt_tpu.ops.attention import (set_attention, layer_norm,
                                           gelu_tanh, ffn)

import oracles


def _enc(rng, C, F):
    e = {}
    for k in ("wq", "wk", "wv", "wo"):
        e[k] = rng.normal(0, 0.1, (C, C)).astype(np.float32)
    for k in ("bq", "bk", "bv", "bo"):
        e[k] = rng.normal(0, 0.1, (C,)).astype(np.float32)
    e["ffn_w1"] = rng.normal(0, 0.1, (C, F)).astype(np.float32)
    e["ffn_b1"] = rng.normal(0, 0.1, (F,)).astype(np.float32)
    e["ffn_w2"] = rng.normal(0, 0.1, (F, C)).astype(np.float32)
    e["ffn_b2"] = rng.normal(0, 0.1, (C,)).astype(np.float32)
    return e


def test_set_attention_matches_oracle(rng):
    P, C, S, K, H = 40, 32, 6, 12, 4
    feats = rng.normal(0, 1, (P, C)).astype(np.float32)
    pos = rng.normal(0, 1, (P, C)).astype(np.float32)
    inds = rng.integers(0, P, (S, K))
    # duplicate-padding pattern in the last set + mask
    inds[-1, 6:] = inds[-1, 5]
    mask = np.zeros((S, K), np.float32)
    mask[-1, 6:] = -3.4028235e38
    enc = _enc(rng, C, 2 * C)

    feats_d = jnp.concatenate([jnp.asarray(feats), jnp.zeros((1, C))])
    pos_d = jnp.concatenate([jnp.asarray(pos), jnp.zeros((1, C))])
    out = set_attention(feats_d, pos_d, jnp.asarray(inds), jnp.asarray(mask),
                        {k: jnp.asarray(v) for k, v in enc.items()}, H)
    ref = oracles.attention_oracle(feats, pos, inds, mask, enc, H)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-5)


def test_masked_keys_do_not_contribute(rng):
    """Changing a masked slot's key/value must not change other outputs."""
    P, C, S, K, H = 20, 32, 1, 8, 4
    feats = rng.normal(0, 1, (P + 1, C)).astype(np.float32)
    pos = np.zeros((P + 1, C), np.float32)
    inds = np.arange(8)[None, :]
    mask = np.zeros((1, K), np.float32)
    mask[0, 7] = -3.4028235e38
    enc = {k: jnp.asarray(v) for k, v in _enc(rng, C, 2 * C).items()}

    out1 = np.asarray(set_attention(jnp.asarray(feats), jnp.asarray(pos),
                                    jnp.asarray(inds), jnp.asarray(mask), enc, H))
    feats2 = feats.copy()
    feats2[7] += 3.0  # perturb the masked slot's pillar
    out2 = np.asarray(set_attention(jnp.asarray(feats2), jnp.asarray(pos),
                                    jnp.asarray(inds), jnp.asarray(mask), enc, H))
    np.testing.assert_allclose(out1[0, :7], out2[0, :7], atol=1e-6)
    assert np.abs(out1[0, 7] - out2[0, 7]).max() > 1e-3  # its own row did move


def test_layer_norm_and_gelu(rng):
    x = rng.normal(0, 2, (50, 32)).astype(np.float32)
    g = rng.normal(1, 0.1, (32,)).astype(np.float32)
    b = rng.normal(0, 0.1, (32,)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(layer_norm(jnp.asarray(x), g, b, 1e-5)),
        oracles.layer_norm_oracle(x, g, b, 1e-5), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(gelu_tanh(jnp.asarray(x))), oracles.gelu_oracle(x), atol=1e-6)


def test_ffn(rng):
    C, F = 32, 64
    enc = _enc(rng, C, F)
    x = rng.normal(0, 1, (30, C)).astype(np.float32)
    out = np.asarray(ffn(jnp.asarray(x), {k: jnp.asarray(v) for k, v in enc.items()}))
    ref = oracles.gelu_oracle(x @ enc["ffn_w1"] + enc["ffn_b1"]) @ enc["ffn_w2"] + enc["ffn_b2"]
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)


def test_encoder_epilogue_pallas_matches_xla(tiny_cfg, rng):
    """The fused Pallas epilogue must reproduce the XLA chain
    (out-proj -> LN -> FFN -> LN -> add -> LN) in interpret mode."""
    import jax.numpy as jnp
    from dsvt_ai_trt_tpu import weights
    from dsvt_ai_trt_tpu.ops.attention import layer_norm, ffn
    from dsvt_ai_trt_tpu.ops.encoder_pallas import encoder_epilogue

    cfg = tiny_cfg
    params = weights.random_params(cfg, seed=4)
    enc = params["blocks"][0]["enc"][0]
    P, C = 256, cfg.d_model
    x = jnp.asarray(rng.normal(0, 1, (P, C)).astype(np.float32))
    a = jnp.asarray(rng.normal(0, 0.5, (P, C)).astype(np.float32))

    attn_p = a @ enc["wo"] + enc["bo"]
    x1 = layer_norm(x + attn_p, enc["ln1_g"], enc["ln1_b"], cfg.ln_eps)
    x2 = layer_norm(x1 + ffn(x1, enc, "fp32"), enc["ln2_g"], enc["ln2_b"],
                    cfg.ln_eps)
    ref = layer_norm(x2 + x, enc["norm_g"], enc["norm_b"], cfg.ln_eps)

    got = encoder_epilogue(x, a, enc, cfg.ln_eps, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_encoder_epilogue_pads_awkward_row_counts(tiny_cfg, rng):
    """A row count with no large 8-aligned divisor (8x a prime) must pad up
    to a dense block rather than fall back to a P/8-step grid that
    re-streams the weights every step (ADVICE r2)."""
    import jax.numpy as jnp
    from dsvt_ai_trt_tpu import weights
    from dsvt_ai_trt_tpu.ops.attention import layer_norm, ffn
    from dsvt_ai_trt_tpu.ops.encoder_pallas import encoder_epilogue

    cfg = tiny_cfg
    params = weights.random_params(cfg, seed=4)
    enc = params["blocks"][0]["enc"][0]
    P, C = 8 * 31, cfg.d_model  # 248: largest 8-aligned divisor is 8
    x = jnp.asarray(rng.normal(0, 1, (P, C)).astype(np.float32))
    a = jnp.asarray(rng.normal(0, 0.5, (P, C)).astype(np.float32))

    attn_p = a @ enc["wo"] + enc["bo"]
    x1 = layer_norm(x + attn_p, enc["ln1_g"], enc["ln1_b"], cfg.ln_eps)
    x2 = layer_norm(x1 + ffn(x1, enc, "fp32"), enc["ln2_g"], enc["ln2_b"],
                    cfg.ln_eps)
    ref = layer_norm(x2 + x, enc["norm_g"], enc["norm_b"], cfg.ln_eps)

    got = encoder_epilogue(x, a, enc, cfg.ln_eps, interpret=True)
    assert got.shape == (P, C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
