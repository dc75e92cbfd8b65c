"""Dynamic-int8 encoder inference: quantization error bounds + wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaptive_tpu.models import resnet as R
from adaptive_tpu.models.factory import build_model
from adaptive_tpu.models.infer import (_conv_i8, _quant_w, _quant_x, fold_resnet,
                                       resnet_apply_folded, resnet_apply_folded_int8)


def test_quantizers_roundtrip_bounds():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)), jnp.float32)
    xq, sx = _quant_x(x)
    err = np.abs(np.asarray(xq, np.float32) * float(sx) - np.asarray(x))
    assert err.max() <= float(sx) / 2 + 1e-6  # half-ulp rounding bound

    w = jnp.asarray(rng.normal(size=(3, 3, 16, 32)), jnp.float32)
    wq, sw = _quant_w(w)
    deq = np.asarray(wq, np.float32) * np.asarray(sw)[None, None, None, :]
    err = np.abs(deq - np.asarray(w))
    assert (err.max(axis=(0, 1, 2)) <= np.asarray(sw) / 2 + 1e-6).all()


def test_single_conv_int8_close_to_fp32():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 12, 12, 16)), jnp.float32)
    p = {"kernel": jnp.asarray(rng.normal(size=(3, 3, 16, 32)), jnp.float32) * 0.1,
         "bias": jnp.asarray(rng.normal(size=(32,)), jnp.float32)}
    want = jax.lax.conv_general_dilated(
        x, p["kernel"], (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["bias"]
    got = _conv_i8(x, p, out_dtype=jnp.float32)
    rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert rel < 0.02, rel  # ~1% relative error typical of int8 PTQ


def test_int8_resnet_features_close_to_fp32():
    params, state = R.init_resnet(jax.random.PRNGKey(0), "resnet18")
    rng = np.random.default_rng(2)
    state = jax.tree.map(lambda x: jnp.asarray(rng.uniform(0.8, 1.2, x.shape), jnp.float32), state)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    folded = fold_resnet(params, state, "resnet18")
    want = resnet_apply_folded(folded, x, "resnet18")
    got = resnet_apply_folded_int8(folded, x, "resnet18")
    # relative feature error through the whole (random-init) stack
    rel = float(jnp.linalg.norm(got - want) / (jnp.linalg.norm(want) + 1e-9))
    assert rel < 0.25, rel  # loose bound: random nets amplify; real nets are tamer


def test_static_scales_match_dynamic(tiny_cf):
    """Calibrated static scales (on the same batch) must track the dynamic
    path closely — the batch max IS the calibration max here."""
    from adaptive_tpu.models.infer import calibrate_int8

    params, state = R.init_resnet(jax.random.PRNGKey(3), "resnet18")
    rng = np.random.default_rng(3)
    bn_state = jax.tree.map(lambda x: jnp.asarray(rng.uniform(0.8, 1.2, x.shape), jnp.float32), state)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    enc = {"resnet": params}
    full_state = {"resnet": bn_state}
    scales = calibrate_int8(enc, full_state, x, "resnet18")
    assert len(scales) > 15 and all(s > 0 for s in scales.values())
    folded = fold_resnet(params, bn_state, "resnet18")
    dyn = resnet_apply_folded_int8(folded, x, "resnet18")
    sta = resnet_apply_folded_int8(folded, x, "resnet18", scales)
    rel = float(jnp.linalg.norm(sta - dyn) / (jnp.linalg.norm(dyn) + 1e-9))
    assert rel < 0.05, rel


def test_stem_s2d_bit_exact():
    """The space-to-depth stem rewrite (7x7/s2 -> s2d + 4x4/s1) must be
    BIT-exact on the int8 carry path: same integer products in the s32
    accumulator, and _quant_w's per-channel max|w| is unchanged by the
    added zero taps (models/infer.py::_stem_s2d_kernel derivation)."""
    from adaptive_tpu.models.infer import calibrate_int8

    params, state = R.init_resnet(jax.random.PRNGKey(5), "resnet18")
    rng = np.random.default_rng(5)
    state = jax.tree.map(
        lambda x: jnp.asarray(rng.uniform(0.8, 1.2, x.shape), jnp.float32), state
    )
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    scales = calibrate_int8({"resnet": params}, {"resnet": state}, x, "resnet18")
    folded = fold_resnet(params, state, "resnet18")
    base = np.asarray(resnet_apply_folded_int8(folded, x, "resnet18", scales))
    s2d = np.asarray(
        resnet_apply_folded_int8(folded, x, "resnet18", scales, stem_s2d=True)
    )
    np.testing.assert_array_equal(s2d, base)


def test_stem_s2d_odd_input_falls_back_to_7x7():
    """s2d packs 2x2 pixel blocks, so an odd input size cannot be rewritten:
    the inline carry forward must fall back to the plain 7x7 stem (identical
    math) instead of crashing in the packing reshape."""
    from adaptive_tpu.models.infer import calibrate_int8

    params, state = R.init_resnet(jax.random.PRNGKey(5), "resnet18")
    rng = np.random.default_rng(5)
    state = jax.tree.map(
        lambda x: jnp.asarray(rng.uniform(0.8, 1.2, x.shape), jnp.float32), state
    )
    x = jnp.asarray(rng.normal(size=(2, 63, 63, 3)), jnp.float32)
    scales = calibrate_int8({"resnet": params}, {"resnet": state}, x, "resnet18")
    folded = fold_resnet(params, state, "resnet18")
    base = np.asarray(resnet_apply_folded_int8(folded, x, "resnet18", scales))
    s2d = np.asarray(
        resnet_apply_folded_int8(folded, x, "resnet18", scales, stem_s2d=True)
    )
    np.testing.assert_array_equal(s2d, base)


def test_stem_s2d_odd_crop_model_resolution():
    """Model-level guard: 'auto' resolves s2d OFF for an odd crop size;
    an explicit int8_stem_s2d=True with an odd crop raises with the knob
    named (the prepared 4x4 stem could never run on odd inputs)."""
    from adaptive_tpu.config import Config
    from adaptive_tpu.models.factory import build_model

    cf = Config(
        atten_model_name="adaptive_attention", encoder_backbone="resnet18",
        train_crop_size=63, vocab_length=16,
        adaptive_word_embed_size=8, adaptive_lstm_hidden_size=16,
        encoder_quant="int8",
    )
    model = build_model(cf)
    assert model._resolved_fusion()[2] is False
    with pytest.raises(ValueError, match="even"):
        model._replace(int8_stem_s2d=True)._resolved_fusion()


def test_stem_s2d_kernel_transform_exact_fp():
    """Direct transform check in exact float arithmetic: the rewritten conv
    equals the 7x7/s2 conv on random f32 inputs (same products, fp32 dot)."""
    from adaptive_tpu.models.infer import _s2d, _stem_s2d_kernel

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(7, 7, 3, 8)), jnp.float32)
    want = jax.lax.conv_general_dilated(
        x, w, (2, 2), [(3, 3), (3, 3)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    got = jax.lax.conv_general_dilated(
        _s2d(x), _stem_s2d_kernel(w), (1, 1), [(2, 1), (2, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_int8_greedy_decode_runs(tiny_cf):
    from adaptive_tpu.decoding import make_greedy_decoder

    cf = tiny_cf.replace(encoder_quant="int8")
    model = build_model(cf)
    assert model.encoder_quant == "int8"
    params, state = model.init(jax.random.PRNGKey(0))
    decode = make_greedy_decoder(model, cf)
    imgs = np.random.default_rng(0).integers(0, 255, (2, 72, 72, 3), dtype=np.uint8)
    out = decode(params, state, imgs)
    assert np.isfinite(np.asarray(out.beta)).all()
    assert out.ids.shape == (2, cf.decode_max_len)


def test_mismatched_scales_fail_loudly(tiny_cf):
    """Stale/mismatched calibration must raise, not silently fall back to the
    slow dynamic path."""
    params, state = R.init_resnet(jax.random.PRNGKey(0), "resnet18")
    folded = fold_resnet(params, state, "resnet18")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    with pytest.raises(ValueError, match="recalibrate"):
        resnet_apply_folded_int8(folded, x, "resnet18", scales={"conv1": 0.1})


def test_bn_shifted_moments_numerics():
    """Two-moment BN variance must survive large-mean/low-std channels when
    the running mean tracks the batch mean (the shifted form; the naive
    E[x^2]-E[x]^2 collapses to 0 here)."""
    from adaptive_tpu.models.resnet import _bn

    rng = np.random.default_rng(0)
    x = jnp.asarray(100.0 + 0.01 * rng.normal(size=(8, 16, 16, 4)), jnp.float32)
    p = {"scale": jnp.ones(4), "bias": jnp.zeros(4)}
    s = {"mean": jnp.full((4,), 100.0), "var": jnp.full((4,), 1e-4)}
    y, new_s = _bn(x, p, s, train=True)
    batch_var = np.var(np.asarray(x, np.float64), axis=(0, 1, 2))
    got_var = (np.asarray(new_s["var"]) - 0.9 * 1e-4) / 0.1  # undo momentum mix
    np.testing.assert_allclose(got_var, batch_var, rtol=2e-3)
    # normalized output has ~unit std, not the blow-up of var=0
    assert 0.9 < float(jnp.std(y.astype(jnp.float32))) < 1.1


def test_config_validates_quant():
    from adaptive_tpu.config import load_config

    with pytest.raises(ValueError):
        load_config(None, encoder_quant="fp4")


def test_per_channel_scales_tighter_than_per_tensor():
    """encoder_quant_granularity='channel': per-channel activation scales fold
    into the kernels (models/infer.py::_acc_i8) — same conv program, strictly
    better quantization resolution. The end-to-end carry error must not be
    worse than per-tensor's (and is typically much tighter on real nets where
    post-BN-fold channel ranges differ by orders of magnitude)."""
    from adaptive_tpu.models.infer import calibrate_int8

    params, state = R.init_resnet(jax.random.PRNGKey(5), "resnet18")
    rng = np.random.default_rng(5)
    # spread the BN scales so channels have very different dynamic ranges —
    # the regime per-channel exists for
    state = jax.tree.map(
        lambda x: jnp.asarray(rng.uniform(0.2, 3.0, x.shape), jnp.float32), state
    )
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    folded = fold_resnet(params, state, "resnet18")
    fp = np.asarray(resnet_apply_folded(folded, x, "resnet18"))
    errs = {}
    for gran in ("tensor", "channel"):
        scales = calibrate_int8(
            {"resnet": params}, {"resnet": state}, x, "resnet18", granularity=gran
        )
        i8 = np.asarray(resnet_apply_folded_int8(folded, x, "resnet18", scales))
        errs[gran] = np.abs(i8 - fp).mean() / (np.abs(fp).mean() + 1e-9)
    assert errs["channel"] <= errs["tensor"] * 1.05, errs
    assert errs["channel"] < 0.08, errs


def test_per_channel_stem_s2d_bit_exact():
    """The s2d stem rewrite stays bit-exact under per-channel scales: the
    tiled scale vector folds identical factors onto the scattered taps and
    zero taps stay zero, so _quant_w sees the same per-out-channel max."""
    from adaptive_tpu.models.infer import calibrate_int8

    params, state = R.init_resnet(jax.random.PRNGKey(5), "resnet18")
    rng = np.random.default_rng(5)
    state = jax.tree.map(
        lambda x: jnp.asarray(rng.uniform(0.8, 1.2, x.shape), jnp.float32), state
    )
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    scales = calibrate_int8(
        {"resnet": params}, {"resnet": state}, x, "resnet18", granularity="channel"
    )
    assert all(getattr(v, "ndim", 0) == 1 for v in scales.values())
    folded = fold_resnet(params, state, "resnet18")
    base = np.asarray(resnet_apply_folded_int8(folded, x, "resnet18", scales))
    s2d = np.asarray(
        resnet_apply_folded_int8(folded, x, "resnet18", scales, stem_s2d=True)
    )
    np.testing.assert_array_equal(s2d, base)


def test_per_channel_rejects_fused_kernels():
    """The fused Pallas block/tail kernels take scalar carry scales; mixing
    them with per-channel calibration must fail loudly."""
    from adaptive_tpu.models.infer import calibrate_int8

    params, state = R.init_resnet(jax.random.PRNGKey(0), "resnet18")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    scales = calibrate_int8(
        {"resnet": params}, {"resnet": state}, x, "resnet18", granularity="channel"
    )
    folded = fold_resnet(params, state, "resnet18")
    with pytest.raises(ValueError, match="per-channel"):
        resnet_apply_folded_int8(
            folded, x, "resnet18", scales, fused_layers=("layer3",)
        )


def test_config_validates_quant_granularity():
    from adaptive_tpu.config import load_config

    with pytest.raises(ValueError, match="granularity"):
        load_config(None, encoder_quant_granularity="group")


def test_int8_carry_close_to_fp(tiny_cf):
    """The static-scale carry path must track the exact folded forward within
    quantization noise END TO END. Regression for the zero-point padding bug:
    XLA zero-pads convs, but in zp-128 space zero means +128*s, which
    corrupted every 3x3 border position (carry error went 2% -> 230%) while
    the weaker static-vs-dynamic bound stayed green."""
    from adaptive_tpu.models.infer import (
        calibrate_int8, fold_resnet, resnet_apply_folded, resnet_apply_folded_int8,
    )

    params, state = R.init_resnet(jax.random.PRNGKey(5), "resnet18")
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    scales = calibrate_int8({"resnet": params}, {"resnet": state}, x, "resnet18")
    folded = fold_resnet(params, state, "resnet18")
    fp = np.asarray(resnet_apply_folded(folded, x, "resnet18"))
    i8 = np.asarray(resnet_apply_folded_int8(folded, x, "resnet18", scales))
    rel = np.abs(i8 - fp).mean() / (np.abs(fp).mean() + 1e-9)
    assert rel < 0.08, rel


def _rand_resnet18(seed=5, bn_lo=0.8, bn_hi=1.2):
    params, state = R.init_resnet(jax.random.PRNGKey(seed), "resnet18")
    rng = np.random.default_rng(seed)
    state = jax.tree.map(
        lambda x: jnp.asarray(rng.uniform(bn_lo, bn_hi, x.shape), jnp.float32), state
    )
    return params, state, rng


def test_bias_correction_matches_fp_means():
    """calibrate_int8_bias's defining invariant: after folding the returned
    corrections into the biases, a second calibration pass finds ~zero
    residual mean error at every conv (the quantized means now match the
    fp32 forward's on the calibration batch)."""
    from adaptive_tpu.models.infer import calibrate_int8, calibrate_int8_bias

    params, state, rng = _rand_resnet18()
    x = jnp.asarray(rng.standard_normal((4, 64, 64, 3)), jnp.float32)
    enc, st = {"resnet": params}, {"resnet": state}
    scales = calibrate_int8(enc, st, x, "resnet18", granularity="channel")
    corr = calibrate_int8_bias(enc, st, x, "resnet18", scales)
    assert set(corr) == {k for k in scales if not k.endswith("downsample_out")}
    assert all(np.isfinite(v).all() for v in corr.values())

    # fold corrections into the raw (unfolded) conv biases via the folded
    # tree route: rebuild params with bn bias shifted is fiddly — instead
    # rerun the collection with bias_corr applied through the public path
    # and assert the residual deltas vanish.
    from adaptive_tpu.models.infer import (_folded_forward, _plain_conv,
                                           _resnet_int8_carry, fold_resnet)

    folded = fold_resnet(params, state, "resnet18")
    means = {}

    def conv(name, xx, p, stride, pad):
        y = _plain_conv(name, xx, p, stride, pad)
        means[name] = jnp.mean(y.astype(jnp.float32), axis=(0, 1, 2))
        return y

    _folded_forward(folded, x, "resnet18", conv)
    residual = {}
    corrected = {
        k: ({**v, "bias": v["bias"] + corr[k]} if k in corr else v)
        for k, v in folded.items() if k == "conv1"
    }
    corrected.update({
        lk: [
            {ck: ({**cv, "bias": cv["bias"] + corr[f"{lk}.{bi}.{ck}"]}
                  if f"{lk}.{bi}.{ck}" in corr else cv)
             for ck, cv in blk.items()}
            for bi, blk in enumerate(folded[lk])
        ]
        for lk in folded if lk.startswith("layer")
    })
    _resnet_int8_carry(corrected, x, "resnet18", scales,
                       fp_means=means, collect_into=residual)
    for k, v in residual.items():
        scale_mag = float(np.mean(np.abs(np.asarray(means[k])))) + 1e-3
        assert float(np.max(np.abs(np.asarray(v)))) < 0.05 * scale_mag + 1e-3, (
            k, np.max(np.abs(np.asarray(v))))


def test_bias_correction_improves_feature_error():
    """End to end on the calibration batch, bias correction must not make the
    int8 features worse (and typically improves them)."""
    from adaptive_tpu.models.infer import calibrate_int8, calibrate_int8_bias

    params, state, rng = _rand_resnet18(seed=6, bn_lo=0.2, bn_hi=3.0)
    x = jnp.asarray(rng.standard_normal((4, 64, 64, 3)), jnp.float32)
    enc, st = {"resnet": params}, {"resnet": state}
    scales = calibrate_int8(enc, st, x, "resnet18", granularity="channel")
    corr = calibrate_int8_bias(enc, st, x, "resnet18", scales)
    folded = fold_resnet(params, state, "resnet18")
    fp = np.asarray(resnet_apply_folded(folded, x, "resnet18"))
    base = np.asarray(resnet_apply_folded_int8(folded, x, "resnet18", scales))
    fixed = np.asarray(
        resnet_apply_folded_int8(folded, x, "resnet18", scales, bias_corr=corr)
    )
    err_base = np.abs(base - fp).mean()
    err_fixed = np.abs(fixed - fp).mean()
    assert err_fixed <= err_base * 1.02, (err_fixed, err_base)


def test_prepared_matches_inline_with_bias_corr(tiny_cf):
    """Offline-folded corrections (prepare_encoder_inference) must equal the
    inline bias_corr path bit-for-bit."""
    from adaptive_tpu.models.infer import (calibrate_int8, calibrate_int8_bias,
                                           encoder_apply_inference,
                                           prepare_encoder_inference)

    model = build_model(tiny_cf)
    params, state = model.init(jax.random.PRNGKey(3))
    enc, st = params["encoder"], state
    rng = np.random.default_rng(4)
    images = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    arch = tiny_cf.encoder_backbone
    scales = calibrate_int8(enc, st, images, arch, granularity="channel")
    corr = calibrate_int8_bias(enc, st, images, arch, scales)
    for s2d in (False, True):
        inline = encoder_apply_inference(
            enc, st, images, arch, model.compute_dtype, quant="int8",
            scales=scales, stem_s2d=s2d, bias_corr=corr,
        )
        prepared = prepare_encoder_inference(
            enc, st, arch, model.compute_dtype, quant="int8", scales=scales,
            stem_s2d=s2d, bias_corr=corr,
        )
        hoisted = encoder_apply_inference(
            None, None, images, arch, model.compute_dtype, quant="int8",
            scales=scales, stem_s2d=s2d, prepared=prepared, bias_corr=corr,
        )
        for a, b in zip(inline, hoisted):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bias_corr_rejects_fused_kernels():
    from adaptive_tpu.models.infer import calibrate_int8, calibrate_int8_bias

    params, state, rng = _rand_resnet18(seed=0)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    scales = calibrate_int8({"resnet": params}, {"resnet": state}, x, "resnet18",
                            granularity="tensor")
    corr = calibrate_int8_bias({"resnet": params}, {"resnet": state}, x,
                               "resnet18", scales)
    folded = fold_resnet(params, state, "resnet18")
    with pytest.raises(ValueError, match="bias correction"):
        resnet_apply_folded_int8(
            folded, x, "resnet18", scales, fused_layers=("layer3",),
            bias_corr=corr,
        )
