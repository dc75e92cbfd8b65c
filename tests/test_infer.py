"""Inference fast path: BN folding + dtype casting must match the eval-mode
reference forward."""

import jax
import jax.numpy as jnp
import numpy as np

from adaptive_tpu.models import resnet as R
from adaptive_tpu.models.factory import build_model
from adaptive_tpu.models.infer import cast_floating, fold_resnet, resnet_apply_folded


def test_folded_resnet_matches_eval_bn():
    params, state = R.init_resnet(jax.random.PRNGKey(0), "resnet18")
    # randomize BN stats so folding is non-trivial
    rng = np.random.default_rng(0)
    state = jax.tree.map(
        lambda x: jnp.asarray(rng.uniform(0.5, 1.5, x.shape), jnp.float32), state
    )
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    want, _ = R.resnet_apply(params, state, x, "resnet18", train=False)
    folded = fold_resnet(params, state, "resnet18")
    got = resnet_apply_folded(folded, x, "resnet18")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_encode_inference_matches_encode(tiny_cf):
    model = build_model(tiny_cf)
    params, state = model.init(jax.random.PRNGKey(1))
    images = jnp.asarray(np.random.default_rng(2).normal(size=(2, 64, 64, 3)), jnp.float32)
    V0, vg0, h00, c00, _ = model.encode(params, state, images, train=False)
    V1, vg1, h01, c01 = model.encode_inference(params, state, images)
    np.testing.assert_allclose(np.asarray(V1), np.asarray(V0), atol=2e-4)
    np.testing.assert_allclose(np.asarray(vg1), np.asarray(vg0), atol=2e-4)
    np.testing.assert_allclose(np.asarray(h01), np.asarray(h00), atol=2e-4)
    np.testing.assert_allclose(np.asarray(c01), np.asarray(c00), atol=2e-4)


def test_cast_floating_preserves_ints():
    tree = {"a": jnp.zeros(3, jnp.float32), "b": jnp.zeros(3, jnp.int32)}
    out = cast_floating(tree, jnp.bfloat16)
    assert out["a"].dtype == jnp.bfloat16 and out["b"].dtype == jnp.int32


def test_prepared_encoder_matches_inline(tiny_cf):
    """prepare_encoder_inference hoists the weight passes; the math must be
    BIT-identical to the inline path for every quant mode (same ops, same
    order — only the program boundary moves)."""
    from adaptive_tpu.models.infer import (calibrate_int8, encoder_apply_inference,
                                           prepare_encoder_inference)

    model = build_model(tiny_cf)
    params, state = model.init(jax.random.PRNGKey(3))
    enc, st = params["encoder"], state
    rng = np.random.default_rng(4)
    images = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    arch = tiny_cf.encoder_backbone

    cases = [("none", None, False)]
    for gran in ("tensor", "channel"):
        scales = calibrate_int8(enc, st, images, arch, granularity=gran)
        cases.append(("int8", scales, False))
        cases.append(("int8", scales, True))
    for quant, scales, s2d in cases:
        inline = encoder_apply_inference(
            enc, st, images, arch, model.compute_dtype, quant=quant,
            scales=scales, stem_s2d=s2d,
        )
        prepared = prepare_encoder_inference(
            enc, st, arch, model.compute_dtype, quant=quant, scales=scales,
            stem_s2d=s2d,
        )
        hoisted = encoder_apply_inference(
            None, None, images, arch, model.compute_dtype, quant=quant,
            scales=scales, stem_s2d=s2d, prepared=prepared,
        )
        for a, b in zip(inline, hoisted):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_prepared_stem_s2d_flag_mismatch_raises(tiny_cf):
    from adaptive_tpu.models.infer import (calibrate_int8, encoder_apply_inference,
                                           prepare_encoder_inference)
    import pytest

    model = build_model(tiny_cf)
    params, state = model.init(jax.random.PRNGKey(3))
    enc = params["encoder"]
    images = jnp.zeros((1, 64, 64, 3), jnp.float32)
    arch = tiny_cf.encoder_backbone
    scales = calibrate_int8(enc, state, images, arch)
    prepared = prepare_encoder_inference(
        enc, state, arch, model.compute_dtype, quant="int8", scales=scales,
        stem_s2d=True,
    )
    with pytest.raises(ValueError, match="stem_s2d"):
        encoder_apply_inference(
            None, None, images, arch, model.compute_dtype, quant="int8",
            scales=scales, stem_s2d=False, prepared=prepared,
        )


def test_greedy_decoder_prepares_once(tiny_cf):
    """The decode wrapper must run the per-checkpoint weight prep once per
    (params, state) identity, not per batch — and identical params through
    the prepared path must decode identically."""
    from adaptive_tpu.decoding import make_greedy_decoder

    model = build_model(tiny_cf)
    params, state = model.init(jax.random.PRNGKey(0))
    decode = make_greedy_decoder(model, tiny_cf)
    imgs = np.random.default_rng(0).integers(0, 255, (2, 72, 72, 3), dtype=np.uint8)
    out1 = decode(params, state, imgs)
    out2 = decode(params, state, imgs)
    assert decode.prepare.misses == 1  # second batch hit the cache
    np.testing.assert_array_equal(np.asarray(out1.ids), np.asarray(out2.ids))
    params2 = jax.tree.map(lambda x: x, params)  # new identity -> re-prep
    out3 = decode(params2, state, imgs)
    assert decode.prepare.misses == 2
    np.testing.assert_array_equal(np.asarray(out3.ids), np.asarray(out1.ids))
