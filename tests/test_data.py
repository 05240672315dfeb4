"""Data layer: resize, bucketing, masks, normalization."""

import numpy as np

from irtpu.data import (
    max_side_resize,
    bucket_shape,
    make_batches,
    normalize_images,
    IMAGENET_MEAN,
    IMAGENET_STD,
)


def rand_img(h, w, seed=0):
    return np.random.RandomState(seed).rand(h, w, 3).astype(np.float32)


def test_max_side_resize_aspect():
    img = rand_img(100, 200)
    out = max_side_resize(img, 50)
    assert out.shape == (25, 50, 3)


def test_max_side_resize_noop():
    img = rand_img(30, 50)
    out = max_side_resize(img, 50)
    assert out is img


def test_bucket_shape():
    assert bucket_shape(65, 100, 32) == (96, 128)
    assert bucket_shape(64, 96, 32) == (64, 96)


def test_normalize():
    x = rand_img(4, 4)
    n = normalize_images(x)
    np.testing.assert_allclose(n * IMAGENET_STD + IMAGENET_MEAN, x, rtol=1e-5)


def test_make_batches_roundtrip():
    imgs = [rand_img(60, 90, i) for i in range(5)] + [rand_img(90, 60, i + 5) for i in range(3)]
    batches = list(make_batches(imgs, image_size=96, batch_size=4))
    seen = np.zeros(8, bool)
    for b in batches:
        assert b.pixels.shape[0] == 4  # padded to batch_size rows
        assert b.pixels.shape[1] % 32 == 0 and b.pixels.shape[2] % 32 == 0
        for row, gi in enumerate(b.indices):
            seen[gi] = True
            # valid region must be the normalized resized image
            h = b.mask[row].any(axis=1).sum()
            w = b.mask[row].any(axis=0).sum()
            assert h > 0 and w > 0
            # padding is zero outside the mask
            assert (b.pixels[row][~b.mask[row]] == 0).all()
    assert seen.all()


def test_make_batches_bbx_crop():
    img = rand_img(100, 100, 42)
    batches = list(
        make_batches([img], image_size=64, batch_size=1, bbxs=[(10, 20, 60, 80)])
    )
    (b,) = batches
    # crop is 50 wide x 60 tall -> max side 60 -> resized to (64, 53)ish
    h = b.mask[0].any(axis=1).sum()
    w = b.mask[0].any(axis=0).sum()
    assert h == 64 and 50 <= w <= 56


def test_squarify():
    imgs = [rand_img(60, 90), rand_img(30, 40, 1)]
    batches = list(make_batches(imgs, image_size=64, batch_size=2, squarify=True))
    assert len(batches) == 1
    assert batches[0].pixels.shape == (2, 64, 64, 3)
    assert batches[0].mask.all()


def test_lanczos_resize_matches_pil():
    from PIL import Image
    from irtpu.data.images import max_side_resize

    rng = np.random.RandomState(7)
    img = rng.rand(200, 150, 3).astype(np.float32)
    got = max_side_resize(img, 96, resize_filter="lanczos")
    pil = Image.fromarray((img * 255).astype(np.uint8))
    want = np.asarray(pil.resize((72, 96), Image.LANCZOS), np.float32) / 255.0
    np.testing.assert_array_equal(got, want)


def test_shrink_only_lanczos_is_reference_default():
    """ExtractConfig defaults = reference thumbnail semantics."""
    from irtpu.utils.config import ExtractConfig

    cfg = ExtractConfig()
    assert cfg.upscale is False and cfg.resize_filter == "lanczos"


def test_make_batches_exact_shapes():
    """bucket_multiple=1: no spatial padding, full masks, same-shape batching."""
    imgs = [rand_img(60, 90, i) for i in range(3)] + [rand_img(45, 30, 9)]
    batches = list(make_batches(imgs, image_size=96, batch_size=4, bucket_multiple=1))
    shapes = sorted(b.pixels.shape[1:3] for b in batches)
    # 60x90 -> 64x96; 45x30 -> 96x64 (upscale default True at function level)
    assert len(batches) == 2
    for b in batches:
        for row in range(b.valid):
            assert b.mask[row].all()  # exact: no spatial padding on real rows
