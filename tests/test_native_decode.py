"""Native C++ decoder: builds, decodes PNG/JPEG, agrees with PIL within
filter tolerance, and outpaces PIL on JPEG."""

import io
import os
import time

import numpy as np
import pytest

from concepthash_tpu import native
from concepthash_tpu.data.preprocess import load_image_host

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native decoder unavailable")


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    # smooth image so resampling-filter differences stay small
    base = np.zeros((300, 400, 3), np.float32)
    yy, xx = np.meshgrid(np.linspace(0, 1, 300), np.linspace(0, 1, 400),
                         indexing="ij")
    for c in range(3):
        base[..., c] = 127 + 120 * np.sin(3 * xx + c) * np.cos(2 * yy + c)
    arr = base.astype(np.uint8)
    png = str(d / "a.png")
    jpg = str(d / "a.jpg")
    Image.fromarray(arr).save(png)
    Image.fromarray(arr).save(jpg, quality=95)
    return png, jpg


def test_png_decode_matches_pil(images):
    png, _ = images
    ours = load_image_host(png, resize=128, use_native=True)
    ref = load_image_host(png, resize=128, use_native=False)
    assert ours.shape == ref.shape == (128, 128, 3)
    diff = np.abs(ours.astype(int) - ref.astype(int))
    # bilinear (ours) vs PIL bicubic+antialias: close on smooth content
    assert np.mean(diff) < 4.0, np.mean(diff)


def test_jpeg_decode_reasonable(images):
    _, jpg = images
    ours = load_image_host(jpg, resize=128, use_native=True)
    ref = load_image_host(jpg, resize=128, use_native=False)
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert np.mean(diff) < 6.0, np.mean(diff)


def test_garbage_falls_back(tmp_path):
    p = str(tmp_path / "garbage.png")
    with open(p, "wb") as f:
        f.write(b"not an image at all")
    assert native.decode_resize_crop(b"not an image at all", 64) is None
    with pytest.raises(Exception):
        load_image_host(p, resize=64, use_native=True)  # PIL fallback raises too


def test_jpeg_throughput_vs_pil(images):
    _, jpg = images
    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        load_image_host(jpg, resize=224, use_native=True)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        load_image_host(jpg, resize=224, use_native=False)
    t_pil = time.perf_counter() - t0
    print(f"native {n/t_native:.0f} img/s vs PIL {n/t_pil:.0f} img/s")
    assert t_native < t_pil * 1.5  # at minimum competitive
