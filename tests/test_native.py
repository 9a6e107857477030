"""Native data runtime (native/depthio.cpp via ctypes): decode parity with
PIL/numpy and integration with the HostLoader batch path."""

import os

import numpy as np
import pytest
from PIL import Image

from mde_tpu.data import DepthDataset, HostLoader, native, synthetic

SIZE = (48, 64)


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available() and not native.build():
        pytest.skip("native toolchain unavailable")


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("native_data")
    synthetic.generate(str(root), n_train=6, n_test=2, size=SIZE)
    return str(root)


def test_png_decode_byte_exact(fixture_dir):
    p = os.path.join(fixture_dir, "train", "sample_000001_rgb.png")
    want = np.asarray(Image.open(p).convert("RGB"))
    assert native.png_info(p) == SIZE
    got = native.decode_png(p, *SIZE)
    np.testing.assert_array_equal(got, want)


def test_png_variants_decode(tmp_path, rng):
    # Exercise gray / RGBA / gray+alpha inputs; PIL writes different filters.
    for mode in ("L", "RGBA", "LA"):
        arr = rng.integers(0, 255, (32, 40, 4)).astype(np.uint8)
        img = Image.fromarray(arr, "RGBA").convert(mode)
        p = str(tmp_path / f"img_{mode}.png")
        img.save(p)
        want = np.asarray(img.convert("RGB"))
        got = native.decode_png(p, 32, 40)
        np.testing.assert_array_equal(got, want)


def test_npy_exact(fixture_dir):
    p = os.path.join(fixture_dir, "train", "sample_000002_depth.npy")
    np.testing.assert_array_equal(native.read_npy(p, *SIZE), np.load(p))


def test_npy_float64_converted(tmp_path, rng):
    arr = rng.standard_normal((5, 7)).astype(np.float64)
    p = str(tmp_path / "d64.npy")
    np.save(p, arr)
    got = native.read_npy(p, 5, 7)
    np.testing.assert_allclose(got, arr.astype(np.float32))


def test_batch_loader_uses_native(fixture_dir):
    ds = DepthDataset(fixture_dir + "/train", fixture_dir + "/train_list.txt")
    # use_native=True explicitly: the default (None) resolves by host core
    # count — False on this 1-core box — and this test pins the native decode
    # path itself, not the default policy (covered in test_data.py).
    loader = HostLoader(ds, batch_size=3, num_workers=2, use_native=True)
    batch = next(iter(loader))
    assert loader._native_hw == SIZE  # native path probed and active
    # results identical to the PIL path
    rgb_pil, depth_pil, _ = ds.load(0)
    np.testing.assert_array_equal(batch["rgb"][0], rgb_pil)
    np.testing.assert_array_equal(batch["depth"][0], depth_pil)


def test_size_mismatch_rejected(fixture_dir):
    p = os.path.join(fixture_dir, "train", "sample_000000_rgb.png")
    with pytest.raises(IOError):
        native.decode_png(p, 10, 10)
