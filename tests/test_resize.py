"""Bilinear-resize parity vs torch.nn.functional.interpolate — both corner
conventions, up- and down-sampling, every rank the framework uses."""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax.numpy as jnp

from mde_tpu.ops import resize_bilinear, upsample2x


def torch_resize(x_bchw, size, align):
    t = torch.from_numpy(x_bchw)
    return TF.interpolate(t, size=size, mode="bilinear", align_corners=align).numpy()


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [
        ((426, 560), (448, 576)),  # dataset-native -> network input
        ((448, 576), (426, 560)),  # prediction -> submission size
        ((14, 18), (28, 36)),      # 2x upsample
        ((13, 17), (7, 5)),        # odd downsample
        ((1, 7), (4, 3)),          # degenerate axis
    ],
)
def test_matches_torch_nchw_semantics(align, in_hw, out_hw, rng):
    b, c = 2, 3
    x = rng.standard_normal((b, c, *in_hw)).astype(np.float32)
    want = torch_resize(x, out_hw, align)
    # Ours is NHWC; convert, run, convert back. atol floor: torch rounds fp32
    # source coordinates with FMA ordering we don't replicate bit-for-bit; the
    # residual weight ULP shows up as ~1e-4 on unit-normal data.
    got = np.asarray(resize_bilinear(jnp.asarray(x.transpose(0, 2, 3, 1)), out_hw, align))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, rtol=1e-4, atol=2e-4)


@pytest.mark.parametrize("align", [True, False])
def test_rank2_and_rank3(align, rng):
    x = rng.standard_normal((9, 11)).astype(np.float32)
    want = torch_resize(x[None, None], (18, 22), align)[0, 0]
    np.testing.assert_allclose(
        np.asarray(resize_bilinear(jnp.asarray(x), (18, 22), align)), want, rtol=1e-4, atol=1e-5
    )
    xb = rng.standard_normal((4, 9, 11)).astype(np.float32)
    want_b = torch_resize(xb[:, None], (5, 7), align)[:, 0]
    np.testing.assert_allclose(
        np.asarray(resize_bilinear(jnp.asarray(xb), (5, 7), align)), want_b, rtol=1e-4, atol=1e-5
    )


def test_upsample2x_matches_torch_scale_factor(rng):
    x = rng.standard_normal((2, 5, 8, 10)).astype(np.float32)  # NCHW for torch
    want = TF.interpolate(
        torch.from_numpy(x), scale_factor=2, mode="bilinear", align_corners=False
    ).numpy()
    got = np.asarray(upsample2x(jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, rtol=1e-4, atol=1e-5)


def test_identity_shortcut(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 3)).astype(np.float32))
    assert resize_bilinear(x, (8, 8)) is x


def test_gradient_flows(rng):
    import jax

    x = jnp.asarray(rng.standard_normal((1, 6, 6, 2)).astype(np.float32))
    g = jax.grad(lambda v: jnp.sum(resize_bilinear(v, (12, 12)) ** 2))(x)
    assert np.all(np.isfinite(np.asarray(g)))


# ------------------------------------------------------------------- bicubic


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("in_hw,out_hw", [((7, 9), (13, 17)), ((37, 37), (16, 20)), ((12, 10), (5, 4))])
def test_bicubic_matches_torch(align, in_hw, out_hw, rng):
    from mde_tpu.ops.resize import resize_bicubic

    x = rng.standard_normal((2, *in_hw, 4)).astype(np.float32)
    want = TF.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), out_hw, mode="bicubic",
        align_corners=align,
    ).numpy()
    got = np.asarray(resize_bicubic(jnp.asarray(x), out_hw, align_corners=align))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, rtol=1e-4, atol=1e-5)


def test_bicubic_dinov2_offset_semantics(rng):
    """The hub's interpolate_pos_encoding passes interpolate_offset=0.1 as an
    explicit scale_factor; source coords use that scale, not in/out."""
    from mde_tpu.ops.resize import resize_bicubic

    m, ph, pw = 37, 16, 20
    x = rng.standard_normal((1, m, m, 8)).astype(np.float32)
    sx, sy = float(ph + 0.1) / m, float(pw + 0.1) / m
    want = TF.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), scale_factor=(sx, sy),
        mode="bicubic", antialias=False,
    ).numpy()
    assert want.shape[-2:] == (ph, pw)
    got = np.asarray(
        resize_bicubic(
            jnp.asarray(x), (ph, pw), align_corners=False,
            src_scales=(m / (ph + 0.1), m / (pw + 0.1)),
        )
    )
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, rtol=1e-4, atol=1e-5)
    # and the offset semantics differ measurably from the plain in/out scale
    plain = np.asarray(resize_bicubic(jnp.asarray(x), (ph, pw), align_corners=False))
    assert np.abs(plain - got).max() > 1e-4
