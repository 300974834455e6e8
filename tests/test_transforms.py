"""Transforms: shape/semantic checks + golden vs reference PIL pipeline."""

import random

import numpy as np
from PIL import Image

from vgen_tpu.data import transforms as T


def _frames(f=3, h=100, w=160, seed=0):
    return np.random.RandomState(seed).randint(0, 255, (f, h, w, 3),
                                               np.uint8)


def test_resize_and_rescale():
    x = _frames()
    assert T.resize(x, 64).shape == (3, 64, 64, 3)
    assert T.resize(x, (80, 40)).shape == (3, 40, 80, 3)
    y = T.rescale(x, 50)  # short side (h=100) -> 50, w scales to 80
    assert y.shape == (3, 50, 80, 3)


def test_center_crop_v2_matches_reference_math():
    x = _frames(h=300, w=500)
    y = T.center_crop_v2(x, 64)
    assert y.shape == (3, 64, 64, 3)
    # reference fast path: BOX-halve while short side >= 2*size
    img = Image.fromarray(x[0])
    while min(img.size) >= 2 * 64:
        img = img.resize((img.width // 2, img.height // 2), Image.BOX)
    scale = 64 / min(img.size)
    img = img.resize((round(scale * img.width), round(scale * img.height)),
                     Image.BICUBIC)
    x1 = (img.width - 64) // 2
    y1 = (img.height - 64) // 2
    ref = np.asarray(img.crop((x1, y1, x1 + 64, y1 + 64)))
    np.testing.assert_array_equal(y[0], ref)


def test_resize_random_crop_paired_box():
    x = _frames(h=240, w=320)
    rng = random.Random(7)
    y, box = T.resize_random_crop(x, size=64, size_short=80, rng=rng,
                                  return_box=True)
    assert y.shape == (3, 64, 64, 3)
    z = T.resize_assign_crop(x, box, size=64, size_short=80)
    np.testing.assert_array_equal(y, z)  # same stream + same box -> equal


def test_random_resized_crop_shape_and_determinism():
    x = _frames()
    a = T.random_resized_crop(x, 48, rng=random.Random(3))
    b = T.random_resized_crop(x, 48, rng=random.Random(3))
    assert a.shape == (3, 48, 48, 3)
    np.testing.assert_array_equal(a, b)


def test_color_ops():
    x = _frames()
    g = T.random_gray(x, p=1.0, rng=random.Random(0))
    assert (g[..., 0] == g[..., 1]).all() and (g[..., 1] == g[..., 2]).all()
    j = T.color_jitter(x, p=1.0, rng=random.Random(1))
    assert j.shape == x.shape and j.dtype == np.uint8
    assert not np.array_equal(j, x)
    blur = T.gaussian_blur(x, p=1.0, rng=random.Random(2))
    assert blur.shape == x.shape
    # blur reduces high-frequency energy
    assert np.abs(np.diff(blur[0, :, :, 0].astype(int), axis=0)).mean() < \
        np.abs(np.diff(x[0, :, :, 0].astype(int), axis=0)).mean()


def test_normalize_clamps_first():
    x = np.asarray([[-0.5, 0.5, 1.5]], np.float32).reshape(1, 1, 3)
    out = T.normalize(x, [0.0, 0.0, 0.0], [1.0, 1.0, 1.0])
    np.testing.assert_allclose(out.ravel(), [0.0, 0.5, 1.0])
