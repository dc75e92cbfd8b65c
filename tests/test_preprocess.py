"""On-device preprocessing guards: normalization parity, crop/flip
determinism, fp32-vs-bf16 resize deviation bound."""

import jax
import jax.numpy as jnp
import numpy as np

from adaptive_tpu.ops.preprocess import (IMAGENET_MEAN, IMAGENET_STD,
                                         eval_preprocess, normalize,
                                         random_crop_flip, train_preprocess)


def test_normalize_matches_torchvision_formula():
    img = np.random.default_rng(0).integers(0, 255, (1, 4, 4, 3), dtype=np.uint8)
    got = np.asarray(normalize(jnp.asarray(img)))
    want = (img.astype(np.float32) / 255.0 - np.array(IMAGENET_MEAN)) / np.array(IMAGENET_STD)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_random_crop_flip_deterministic_and_in_bounds():
    key = jax.random.PRNGKey(7)
    imgs = jnp.asarray(np.random.default_rng(1).integers(0, 255, (4, 72, 72, 3), dtype=np.uint8))
    a = np.asarray(random_crop_flip(key, imgs, 64))
    b = np.asarray(random_crop_flip(key, imgs, 64))
    np.testing.assert_array_equal(a, b)  # same key -> same augmentation
    c = np.asarray(random_crop_flip(jax.random.PRNGKey(8), imgs, 64))
    assert not np.array_equal(a, c)  # different key -> different crops
    assert a.shape == (4, 64, 64, 3)
    # every crop is a genuine sub-window: values subset of the source image
    src_vals = set(np.unique(imgs[0]).tolist())
    assert set(np.unique(a[0]).tolist()) <= src_vals


def test_eval_preprocess_fp32_exact_and_bf16_close():
    imgs = jnp.asarray(np.random.default_rng(2).integers(0, 255, (2, 72, 72, 3), dtype=np.uint8))
    f32 = np.asarray(eval_preprocess(imgs, 64, jnp.float32), np.float32)
    bf = np.asarray(eval_preprocess(imgs, 64, jnp.bfloat16), np.float32)
    # fp32 path: resize then normalize, reference math
    assert np.isfinite(f32).all()
    assert np.abs(f32 - bf).max() < 0.08  # bf16 resize deviation bound


def test_train_preprocess_shapes_and_dtype():
    key = jax.random.PRNGKey(0)
    imgs = jnp.asarray(np.random.default_rng(3).integers(0, 255, (2, 72, 72, 3), dtype=np.uint8))
    out = train_preprocess(key, imgs, 64, jnp.bfloat16)
    assert out.shape == (2, 64, 64, 3) and out.dtype == jnp.bfloat16


def _jpeg_like_images(n=4, size=256, seed=5):
    """Synthetic photo-like content: smooth gradients + hard edges + texture
    (the regimes where resamplers disagree most)."""
    rng = np.random.default_rng(seed)
    imgs = np.zeros((n, size, size, 3), np.float32)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    for i in range(n):
        base = (
            0.5 + 0.4 * np.sin(2 * np.pi * (rng.uniform(0.5, 3) * xx + rng.uniform()))
            * np.cos(2 * np.pi * (rng.uniform(0.5, 3) * yy + rng.uniform()))
        )[..., None]
        # hard-edged blocks (object boundaries)
        for _ in range(6):
            y0, x0 = rng.integers(0, size - 40, 2)
            h, w = rng.integers(16, 96, 2)
            base[y0 : y0 + h, x0 : x0 + w] = rng.uniform(0, 1)
        tex = rng.normal(0, 0.04, (size, size, 3))
        imgs[i] = np.clip(base + tex, 0, 1)
    return (imgs * 255).round().astype(np.uint8)


def test_eval_resize_matches_pil_bilinear():
    """The reference evals through PIL/torchvision Resize(224) BILINEAR
    (code_src/tools/utils.py:135-139, antialiased since Pillow 2.7);
    eval_preprocess uses jax.image.resize(bilinear), which is the same
    triangle-kernel scale-and-translate. Bound the 256->224 delta on
    JPEG-like content in [0,1] pixel units."""
    from PIL import Image

    from adaptive_tpu.ops.preprocess import resize_bilinear

    imgs = _jpeg_like_images()
    pil = np.stack(
        [
            np.asarray(
                Image.fromarray(im).resize((224, 224), Image.BILINEAR), np.float32
            )
            / 255.0
            for im in imgs
        ]
    )
    ours = np.asarray(resize_bilinear(jnp.asarray(imgs) / 255.0, 224), np.float32)
    max_px = np.abs(ours - pil).max()
    mean_px = np.abs(ours - pil).mean()
    print(f"resize delta vs PIL: max={max_px:.5f} mean={mean_px:.6f} (pixel units)")
    assert mean_px < 1.0 / 255.0, mean_px
    assert max_px < 4.0 / 255.0, max_px
