"""Native C++ image ops vs the PIL oracle."""

import numpy as np
import pytest
from PIL import Image

from eegan_tpu.data import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_resize_matches_pil():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (120, 90, 3), np.uint8)
    for size in [(64, 64), (256, 256), (37, 53)]:
        ours = native.resize_bilinear(img, size)
        pil = np.asarray(
            Image.fromarray(img).resize((size[1], size[0]), Image.BILINEAR),
            np.float32)
        # same filter family; uint8 rounding in PIL -> tolerance ~1 level
        assert np.abs(ours - pil).mean() < 1.0
        assert np.abs(ours - pil).max() < 8.0


def test_batch_pyramid_matches_manual():
    rng = np.random.RandomState(1)
    b, h, w = 4, 100, 100
    images = rng.randint(0, 255, (b, h, w, 3), np.uint8)
    crops = np.array([[0, 0, 80, 80], [10, 10, 80, 80],
                      [5, 0, 80, 80], [0, 5, 80, 80]], np.int32)
    flips = np.array([0, 1, 0, 1], np.int32)
    sizes = [16, 32]
    outs = native.batch_pyramid(images, crops, flips, sizes)
    assert [o.shape for o in outs] == [(4, 16, 16, 3), (4, 32, 32, 3)]
    for o in outs:
        assert o.min() >= -1.0 and o.max() <= 1.0

    # manual check for one sample
    i = 1
    y, x, ch, cw = crops[i]
    crop = images[i, y:y + ch, x:x + cw][:, ::-1]
    ours = outs[1][i]
    ref = native.resize_bilinear(np.ascontiguousarray(crop), (32, 32))
    ref = ref / 127.5 - 1.0
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_deterministic():
    rng = np.random.RandomState(2)
    img = rng.randint(0, 255, (64, 64, 3), np.uint8)
    a = native.resize_bilinear(img, (32, 32))
    b = native.resize_bilinear(img, (32, 32))
    np.testing.assert_array_equal(a, b)
