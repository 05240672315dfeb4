"""Native C++ preprocessing vs the PIL oracle pipeline."""

import numpy as np
import pytest

from irtpu.data.native import native_available
from irtpu.data import make_batches
from irtpu.data.images import make_batches_native

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native preproc library not built"
)


@pytest.fixture(scope="module")
def jpgs(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    paths = []
    for i, (h, w) in enumerate([(120, 160), (160, 120), (90, 90), (200, 150)]):
        # low-frequency content so JPEG loss doesn't dominate the comparison
        base = rng.rand(h // 10, w // 10, 3)
        img = np.kron(base, np.ones((10, 10, 1)))[:h, :w]
        p = str(root / f"im{i}.jpg")
        Image.fromarray((img * 255).astype(np.uint8)).save(p, quality=98)
        paths.append(p)
    return paths


def test_decode_matches_pil_pipeline(jpgs):
    b_pil = list(make_batches(jpgs, image_size=96, batch_size=4))
    b_nat = list(make_batches_native(jpgs, image_size=96, batch_size=4))
    assert len(b_pil) == len(b_nat)
    for bp, bn in zip(b_pil, b_nat):
        assert bp.pixels.shape == bn.pixels.shape
        np.testing.assert_array_equal(bp.indices, bn.indices)
        np.testing.assert_array_equal(bp.mask, bn.mask)
        # interpolation differs (PIL box filter vs bilinear): compare loosely
        diff = np.abs(bp.pixels - bn.pixels)[bp.mask.nonzero()]
        assert np.median(diff) < 0.1, np.median(diff)


def test_bbx_crop(jpgs):
    bbxs = [(10, 10, 80, 70), None, None, None]
    b = list(make_batches_native(jpgs, image_size=64, batch_size=4, bbxs=bbxs))
    found = False
    for batch in b:
        for row, gi in enumerate(batch.indices):
            if gi == 0:
                h = batch.mask[row].any(axis=1).sum()
                w = batch.mask[row].any(axis=0).sum()
                # crop 70x60 -> max side 64 -> (55, 64)
                assert w == 64 and 52 <= h <= 58, (h, w)
                found = True
    assert found


def test_failed_decode_raises(tmp_path):
    bad = str(tmp_path / "bad.jpg")
    with open(bad, "wb") as f:
        f.write(b"\xff\xd8not a real jpeg")
    with pytest.raises(IOError):
        list(make_batches_native([bad], image_size=64, batch_size=1))


def test_extractor_native_vs_pil_descriptors(jpgs):
    from irtpu.api import Extractor
    from irtpu.utils.config import ExtractConfig, ModelConfig

    cfg_n = ExtractConfig(model=ModelConfig(arch="resnet18"), image_size=96,
                          batch_size=2, native_preproc=True)
    cfg_p = ExtractConfig(model=ModelConfig(arch="resnet18"), image_size=96,
                          batch_size=2, native_preproc=False)
    ex_n = Extractor(cfg_n)
    ex_p = Extractor(cfg_p, variables=ex_n.variables)
    dn = ex_n.extract(jpgs)
    dp = ex_p.extract(jpgs)
    cos = np.sum(dn * dp, axis=1)
    assert (cos > 0.99).all(), cos


def test_png_and_grayscale_decode(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(3)
    img = (np.kron(rng.rand(12, 16, 3), np.ones((10, 10, 1))) * 255).astype(np.uint8)
    p_png = str(tmp_path / "a.png")
    Image.fromarray(img).save(p_png)
    p_gray = str(tmp_path / "b.jpg")
    Image.fromarray(img[:, :, 0]).save(p_gray, quality=95)  # grayscale jpeg
    p_pal = str(tmp_path / "c.png")
    Image.fromarray(img).convert("P").save(p_pal)  # palette png

    b_nat = list(make_batches_native([p_png, p_gray, p_pal], image_size=80, batch_size=3))
    b_pil = list(make_batches([p_png, p_gray, p_pal], image_size=80, batch_size=3))
    assert len(b_nat) == len(b_pil)
    for bn, bp in zip(b_nat, b_pil):
        np.testing.assert_array_equal(bn.mask, bp.mask)
        diff = np.abs(bn.pixels - bp.pixels)[bn.mask.nonzero()]
        assert np.median(diff) < 0.12, np.median(diff)


def test_shrink_only_semantics(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(9)
    small = (rng.rand(40, 50, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "small.jpg")
    Image.fromarray(small).save(p, quality=95)
    # upscale=False: 40x50 image stays 40x50 under image_size=96
    (b,) = list(make_batches_native([p], image_size=96, batch_size=1, upscale=False))
    h = b.mask[0].any(axis=1).sum()
    w = b.mask[0].any(axis=0).sum()
    assert (h, w) == (40, 50), (h, w)
    # PIL path agrees
    (bp,) = list(make_batches([small.astype(np.float32) / 255], image_size=96,
                              batch_size=1, upscale=False))
    assert bp.pixels.shape == b.pixels.shape
    np.testing.assert_array_equal(bp.mask, b.mask)


def test_native_lanczos_matches_pil_lanczos(tmp_path):
    """The native Lanczos-3 resampler must track PIL LANCZOS within 1 LSB
    (PIL rounds to uint8 between separable passes; we keep float)."""
    from PIL import Image
    from irtpu.data.native import preprocess_batch_native

    rng = np.random.RandomState(13)
    paths, wants = [], []
    for i, (h, w) in enumerate([(300, 220), (97, 311)]):
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        p = str(tmp_path / f"lz{i}.png")  # png: lossless
        Image.fromarray(img).save(p)
        paths.append(p)
        s = 96 / max(h, w)
        nh, nw = max(1, round(h * s)), max(1, round(w * s))
        wants.append(
            np.asarray(Image.fromarray(img).resize((nw, nh), Image.LANCZOS))
        )
    px, sz = preprocess_batch_native(paths, 96, 96, 96, resize_filter="lanczos")
    for i, want in enumerate(wants):
        got = px[i, : sz[i, 0], : sz[i, 1]]
        assert got.shape == want.shape
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_native_lanczos_batches_match_pil_batches(jpgs):
    """Full batching parity: native lanczos path == PIL lanczos path."""
    kw = dict(image_size=96, batch_size=4, resize_filter="lanczos", upscale=False)
    b_pil = list(make_batches(jpgs, **kw))
    b_nat = list(make_batches_native(jpgs, **kw))
    assert len(b_pil) == len(b_nat)
    for bp, bn in zip(b_pil, b_nat):
        np.testing.assert_array_equal(bp.indices, bn.indices)
        np.testing.assert_array_equal(bp.mask, bn.mask)
        d = np.abs(bp.pixels_u8.astype(int) - bn.pixels_u8.astype(int))
        assert d.max() <= 1, d.max()
