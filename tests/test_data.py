"""Data layer: synthetic fixtures, list-file dataset, threaded loader,
on-device preprocessing pipelines."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mde_tpu.data import DepthDataset, HostLoader, split_train_val, synthetic, transforms

SIZE = (64, 80)  # small stand-in for 426x560
INPUT = (72, 88)


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("cil_data")
    synthetic.generate(str(root), n_train=10, n_test=3, size=SIZE)
    return str(root)


def test_dataset_contract(fixture_dir):
    ds = DepthDataset(fixture_dir + "/train", fixture_dir + "/train_list.txt", has_gt=True)
    assert len(ds) == 10
    rgb, depth, entry = ds.load(0)
    assert rgb.shape == (*SIZE, 3) and rgb.dtype == np.uint8
    assert depth.shape == SIZE and depth.dtype == np.float32
    assert entry == "sample_000000_rgb.png sample_000000_depth.npy"
    tds = DepthDataset(fixture_dir + "/test", fixture_dir + "/test_list.txt", has_gt=False)
    rgb, depth, entry = tds.load(1)
    assert depth is None
    assert entry.split(" ")[1] == "test_000001_depth.npy"


def test_split_sizes_and_determinism():
    tr, va = split_train_val(23970, 0.15, seed=0)
    assert len(tr) == 20374 and len(va) == 3596  # same sizes as src/main.py:610-613
    tr2, va2 = split_train_val(23970, 0.15, seed=0)
    np.testing.assert_array_equal(tr, tr2)
    assert set(tr).isdisjoint(set(va))


def test_loader_batches_in_order(fixture_dir):
    ds = DepthDataset(fixture_dir + "/train", fixture_dir + "/train_list.txt")
    loader = HostLoader(ds, batch_size=4, shuffle=False, drop_last=True, num_workers=3)
    batches = list(loader)
    assert len(batches) == 2  # 10 // 4, drop_last
    assert batches[0]["rgb"].shape == (4, *SIZE, 3)
    assert batches[0]["depth"].shape == (4, *SIZE)
    assert batches[0]["names"][0].startswith("sample_000000")
    assert batches[1]["names"][0].startswith("sample_000004")


def test_loader_shuffle_epochs_differ(fixture_dir):
    ds = DepthDataset(fixture_dir + "/train", fixture_dir + "/train_list.txt")
    loader = HostLoader(ds, batch_size=10, shuffle=True, num_workers=2, seed=1)
    e1 = [n for b in loader for n in b["names"]]
    e2 = [n for b in loader for n in b["names"]]
    assert sorted(e1) == sorted(e2)
    assert e1 != e2  # reshuffled between epochs


def test_preprocess_eval_shapes(fixture_dir):
    ds = DepthDataset(fixture_dir + "/train", fixture_dir + "/train_list.txt")
    batch = next(iter(HostLoader(ds, batch_size=2, num_workers=1)))
    rgb, depth = transforms.preprocess_eval(
        jnp.asarray(batch["rgb"]), jnp.asarray(batch["depth"]), input_size=INPUT
    )
    assert rgb.shape == (2, *INPUT, 3)
    assert depth.shape == (2, *INPUT)
    # ImageNet normalization: zero-ish mean-scale, not [0,1]
    assert float(jnp.min(rgb)) < 0.0


def test_preprocess_train_is_stochastic_but_seeded(fixture_dir):
    ds = DepthDataset(fixture_dir + "/train", fixture_dir + "/train_list.txt")
    batch = next(iter(HostLoader(ds, batch_size=2, num_workers=1)))
    rgb_u8, depth = jnp.asarray(batch["rgb"]), jnp.asarray(batch["depth"])
    k = jax.random.key(0)
    a1, d1 = transforms.preprocess_train(k, rgb_u8, depth, input_size=INPUT)
    a2, d2 = transforms.preprocess_train(k, rgb_u8, depth, input_size=INPUT)
    b1, _ = transforms.preprocess_train(jax.random.key(1), rgb_u8, depth, input_size=INPUT)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2))  # same key -> same aug
    assert np.abs(np.asarray(a1) - np.asarray(b1)).max() > 1e-3  # diff key -> diff aug
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2))


def test_pairaug_geometry_is_paired(fixture_dir):
    # With a key that triggers a flip, RGB and depth must transform together:
    # check via correlation between the depth map and the red channel of a
    # synthetic sample where depth is a monotone function of intensity.
    ds = DepthDataset(fixture_dir + "/train", fixture_dir + "/train_list.txt")
    batch = next(iter(HostLoader(ds, batch_size=4, num_workers=1)))
    rgb_u8, depth = jnp.asarray(batch["rgb"]), jnp.asarray(batch["depth"])
    rgb_a, depth_a = transforms.preprocess_pairaug(
        jax.random.key(3), rgb_u8, depth, input_size=INPUT
    )
    assert rgb_a.shape == (4, *INPUT, 3) and depth_a.shape == (4, *INPUT)
    # For every sample the augmented depth must still correlate strongly with
    # augmented luminance (jitter is photometric-only; geometry is shared).
    from mde_tpu.ops.image import denormalize_imagenet

    lum = np.asarray(denormalize_imagenet(rgb_a)).mean(-1).reshape(4, -1)
    dep = np.asarray(depth_a).reshape(4, -1)
    for i in range(4):
        c = np.corrcoef(lum[i], dep[i])[0, 1]
        assert c > 0.7, f"sample {i}: rgb/depth decorrelated (corr={c:.3f})"


def test_color_jitter_identity_when_zero(rng):
    from mde_tpu.ops.image import color_jitter

    x = jnp.asarray(rng.uniform(0, 1, (2, 8, 8, 3)).astype(np.float32))
    y = color_jitter(jax.random.key(0), x, 0.0, 0.0, 0.0, 0.0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_hsv_roundtrip(rng):
    from mde_tpu.ops.image import _hsv_to_rgb, _rgb_to_hsv

    x = jnp.asarray(rng.uniform(0, 1, (64, 3)).astype(np.float32))
    back = _hsv_to_rgb(_rgb_to_hsv(x))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)


def test_loader_cache(fixture_dir):
    ds = DepthDataset(fixture_dir + "/train", fixture_dir + "/train_list.txt")
    loader = HostLoader(ds, batch_size=5, num_workers=2, cache=True)
    first = [b["rgb"].copy() for b in loader]
    assert len(loader._cache) == 10  # all samples cached after epoch 1
    second = [b["rgb"] for b in loader]
    for a, b in zip(first, second):
        np.testing.assert_array_equal(a, b)


def test_utils():
    from mde_tpu.utils import count_params, ensure_dir, remove_module_prefix

    assert remove_module_prefix({"module.a.b": 1, "c": 2}) == {"a.b": 1, "c": 2}
    import jax.numpy as jnp

    assert count_params({"w": jnp.zeros((2, 3)), "b": jnp.zeros((3,))}) == 9


# ---- MiDaS-style host preprocessing (data/midas_transforms.py) ----


def test_compute_resize_shape_semantics():
    from mde_tpu.data.midas_transforms import compute_resize_shape

    # lower_bound keep-AR: output >= target on both axes, /32-snapped
    w, h = compute_resize_shape(560, 426, 384, 384, True, 32, "lower_bound")
    assert w >= 384 and h >= 384
    assert w % 32 == 0 and h % 32 == 0
    # AR preserved by a common scale: the larger axis scale wins
    s = max(384 / 560, 384 / 426)
    assert w == round(s * 560 / 32) * 32 or w == -(-int(s * 560) // 32) * 32

    # upper_bound keep-AR: output <= target on both axes
    w, h = compute_resize_shape(560, 426, 384, 384, True, 32, "upper_bound")
    assert w <= 384 and h <= 384
    assert w % 32 == 0 and h % 32 == 0

    # minimal without keep-AR: each axis scales to its own target exactly
    w, h = compute_resize_shape(560, 426, 384, 384, False, 32, "minimal")
    assert (w, h) == (384, 384)
    # minimal WITH keep-AR: the axis scale closest to 1 wins (384/426 ~ 0.90
    # beats 384/560 ~ 0.69), so w = snap(0.9014 * 560 = 504.8) = 512
    w, h = compute_resize_shape(560, 426, 384, 384, True, 32, "minimal")
    assert (w, h) == (512, 384)

    # exact multiples pass through
    assert compute_resize_shape(384, 384, 384, 384, True, 32, "lower_bound") == (384, 384)


def test_midas_pipeline_registry_shapes():
    import numpy as np

    from mde_tpu.data.midas_transforms import transforms

    reg = transforms()
    assert set(reg) == {"default", "small", "dpt", "beit512", "swin384", "swin256", "levit"}
    img = np.random.default_rng(0).uniform(0, 1, (426, 560, 3)).astype(np.float32)

    out = reg["default"]({"image": img.copy()})
    h, w = out["image"].shape[:2]
    # upper_bound keep-AR at 384: fits inside 384x384, /32 multiples, HWC float32
    assert h <= 384 and w <= 384 and h % 32 == 0 and w % 32 == 0
    assert out["image"].ndim == 3 and out["image"].shape[2] == 3
    assert out["image"].dtype == np.float32

    out = reg["swin384"]({"image": img.copy()})
    assert out["image"].shape[:2] == (384, 384)  # no keep-AR: exact square

    # "default" uses MiDaS normalization (mean/std 0.5): x -> (x - 0.5) / 0.5.
    from mde_tpu.data.midas_transforms import Resize
    import cv2

    resized = Resize(384, 384, keep_aspect_ratio=True, ensure_multiple_of=32,
                     resize_method="upper_bound",
                     image_interpolation_method=cv2.INTER_CUBIC)(
        {"image": img.copy()})["image"]
    out = reg["default"]({"image": img.copy()})
    np.testing.assert_allclose(out["image"], (resized - 0.5) / 0.5, rtol=1e-5, atol=1e-6)


def test_midas_resize_targets_nearest():
    import numpy as np

    from mde_tpu.data.midas_transforms import Resize

    r = Resize(64, 64, resize_target=True, keep_aspect_ratio=False,
               ensure_multiple_of=32, resize_method="minimal")
    img = np.zeros((100, 120, 3), np.float32)
    depth = np.arange(100 * 120, dtype=np.float32).reshape(100, 120)
    out = r({"image": img, "depth": depth.copy(), "mask": depth > 50})
    assert out["image"].shape[:2] == (64, 64)
    assert out["depth"].shape == (64, 64)
    assert out["mask"].shape == (64, 64)
    # nearest interpolation: every output value exists in the input
    assert np.isin(out["depth"], depth).all()


def test_hostloader_native_default_policy(tmp_path):
    """use_native default (None) resolves by host core count: multi-core hosts
    take the native pool (per-sample Python churn dominates there), 1-core
    hosts take PIL's libpng decode (~25% faster single-threaded — measured,
    data/loader.py). Explicit True/False always wins."""
    import os as _os
    from unittest import mock

    from mde_tpu.data.synthetic import generate

    generate(str(tmp_path), n_train=2, n_test=1, size=(16, 20))
    ds = DepthDataset(str(tmp_path / "train"), str(tmp_path / "train_list.txt"))
    with mock.patch.object(_os, "cpu_count", return_value=1):
        assert HostLoader(ds, batch_size=1)._native_hw is None
    with mock.patch.object(_os, "cpu_count", return_value=8):
        assert HostLoader(ds, batch_size=1)._native_hw == "unprobed"
    assert HostLoader(ds, batch_size=1, use_native=False)._native_hw is None
    assert HostLoader(ds, batch_size=1, use_native=True)._native_hw == "unprobed"
