"""On-device image pipeline ops: normalize, color jitter, paired geometric augs.

The reference does all of this on the host, per sample, inside DataLoader worker
processes — torchvision Resize/ColorJitter/Normalize on PIL images for the default
path (src/main.py:578-589) and kornia batched augmentations for the PairAug path
(src/main.py:469-527). Here the host only decodes raw uint8 RGB + float32 depth;
everything below runs batched on the accelerator under jit, with per-sample
randomness derived from a single PRNG key, so the whole augmentation pipeline
fuses into the training step (the BASELINE.json "fused Pallas on-device image
pipeline" north star — expressed as XLA ops that fuse on the VPU, with the
geometric warp as a single composed affine gather pass).

Semantics parity notes (each claim is a TEST in
tests/test_augmentation_torch_parity.py, golden-run 2026-08-20):
- normalization uses the ImageNet mean/std of the reference.
- color jitter matches torchvision's sampling (factor ~ U[max(0,1-a), 1+a],
  hue ~ U[-h, h]) and applies the four adjustments in a random order
  (distributional tests on ranges/moments + all-24-permutations coverage).
- brightness/contrast/saturation match PIL's ImageEnhance — the backend the
  reference's live path actually exercises (ColorJitter on PIL images,
  src/main.py:578-583) — within uint8 quantization (atol 3.5-4/255); hue
  matches torchvision's tensor-backend float formula at 2e-6 and the PIL
  HSV-uint8 path within PIL's own measured quantization floor (+6/255).
- PairAug's geometry (RandomResizedCrop(scale=(0.8,1), ratio=(1,1)) +
  HorizontalFlip(p=.5) + Rotation(3 deg, p=.3)) is composed into ONE affine map
  per sample and applied jointly to RGB+depth with a single bilinear warp —
  the kornia pipeline warps (and interpolates) three times. The warp itself
  matches torch grid_sample (align_corners=False, zeros) at 1e-5 under the
  same affine; the intended interpolate-once-vs-thrice divergence vs the
  three-warp chain is bounded at <2e-2 max-abs interior on smooth fields
  (kornia is not installable here; the chain is reconstructed with plain
  torch grid_sample, which is what kornia's warps bottom out in).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def to_float(u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 [0,255] -> float32 [0,1] (torchvision ToTensor value semantics)."""
    return u8.astype(jnp.float32) / 255.0


def normalize_imagenet(x: jnp.ndarray) -> jnp.ndarray:
    mean = jnp.asarray(IMAGENET_MEAN, dtype=x.dtype)
    std = jnp.asarray(IMAGENET_STD, dtype=x.dtype)
    return (x - mean) / std


def denormalize_imagenet(x: jnp.ndarray) -> jnp.ndarray:
    mean = jnp.asarray(IMAGENET_MEAN, dtype=x.dtype)
    std = jnp.asarray(IMAGENET_STD, dtype=x.dtype)
    return x * std + mean


# ---------------------------------------------------------------------------
# Color jitter (torchvision semantics)
# ---------------------------------------------------------------------------

_GRAY_WEIGHTS = (0.2989, 0.587, 0.114)


def rgb_to_grayscale(x: jnp.ndarray) -> jnp.ndarray:
    w = jnp.asarray(_GRAY_WEIGHTS, dtype=x.dtype)
    return jnp.sum(x * w, axis=-1, keepdims=True)


def _blend(a: jnp.ndarray, b: jnp.ndarray, ratio: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(ratio * a + (1.0 - ratio) * b, 0.0, 1.0)


def adjust_brightness(x, factor):
    return _blend(x, jnp.zeros_like(x), factor)


def adjust_contrast(x, factor):
    mean = jnp.mean(rgb_to_grayscale(x), axis=(-3, -2), keepdims=True)
    return _blend(x, mean, factor)


def adjust_saturation(x, factor):
    return _blend(x, rgb_to_grayscale(x), factor)


def _rgb_to_hsv(x):
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    maxc = jnp.max(x, axis=-1)
    minc = jnp.min(x, axis=-1)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe_delta = jnp.where(delta > 0, delta, 1.0)
    rc = (maxc - r) / safe_delta
    gc = (maxc - g) / safe_delta
    bc = (maxc - b) / safe_delta
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(delta > 0, (h / 6.0) % 1.0, 0.0)
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb(x):
    h, s, v = x[..., 0], x[..., 1], x[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def adjust_hue(x, factor):
    hsv = _rgb_to_hsv(jnp.clip(x, 0.0, 1.0))
    h = (hsv[..., 0] + factor) % 1.0
    return _hsv_to_rgb(jnp.stack([h, hsv[..., 1], hsv[..., 2]], axis=-1))


def color_jitter(
    key: jax.Array,
    x: jnp.ndarray,
    brightness: float = 0.2,
    contrast: float = 0.2,
    saturation: float = 0.2,
    hue: float = 0.1,
) -> jnp.ndarray:
    """Per-sample torchvision-style color jitter on an NHWC batch.

    The default path in the reference uses ColorJitter(0.2, 0.2, 0.2, 0.1)
    (src/main.py:580); PairAug uses (0.4, 0.4, 0.4, 0.15) (src/main.py:488).
    Adjustment order is randomized per sample, as torchvision does.
    """
    b = x.shape[0]
    k_b, k_c, k_s, k_h, k_perm = jax.random.split(key, 5)
    fb = jax.random.uniform(k_b, (b,), minval=max(0.0, 1 - brightness), maxval=1 + brightness)
    fc = jax.random.uniform(k_c, (b,), minval=max(0.0, 1 - contrast), maxval=1 + contrast)
    fs = jax.random.uniform(k_s, (b,), minval=max(0.0, 1 - saturation), maxval=1 + saturation)
    fh = jax.random.uniform(k_h, (b,), minval=-hue, maxval=hue)
    perms = jax.vmap(lambda k: jax.random.permutation(k, 4))(
        jax.random.split(k_perm, b)
    )  # (B, 4)

    def apply_one(img, perm, b_f, c_f, s_f, h_f):
        def step(carry, op_idx):
            img = carry
            img = jax.lax.switch(
                op_idx,
                [
                    lambda im: adjust_brightness(im, b_f),
                    lambda im: adjust_contrast(im, c_f),
                    lambda im: adjust_saturation(im, s_f),
                    lambda im: adjust_hue(im, h_f),
                ],
                img,
            )
            return img, None

        img, _ = jax.lax.scan(step, img, perm)
        return img

    return jax.vmap(apply_one)(x, perms, fb, fc, fs, fh)


# ---------------------------------------------------------------------------
# Affine warps (paired geometric augmentation)
# ---------------------------------------------------------------------------


def affine_sample(img: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Inverse-warp an NHWC batch with per-sample affines, bilinear + zero pad.

    ``theta`` is (B, 2, 3) mapping *output* pixel coords (x, y, 1) to input
    coords. One gather pass for however many ops were composed into theta.
    """
    b, h, w, c = img.shape
    ys, xs = jnp.mgrid[0:h, 0:w]
    ones = jnp.ones_like(xs)
    grid = jnp.stack([xs, ys, ones], axis=-1).astype(img.dtype)  # (H, W, 3)
    src = jnp.einsum("bij,hwj->bhwi", theta, grid)  # (B, H, W, 2) -> (x, y)
    sx, sy = src[..., 0], src[..., 1]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0

    def gather(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        vals = jax.vmap(lambda im, yy, xx: im[yy, xx])(img, yi_c, xi_c)  # (B,H,W,C)
        return vals * valid[..., None].astype(img.dtype)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    fx = fx[..., None]
    fy = fy[..., None]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def _compose(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Compose 2x3 affines as 3x3: result maps through b after a (out->...->in)."""
    bottom = jnp.asarray([[0.0, 0.0, 1.0]], dtype=a.dtype)
    a3 = jnp.concatenate([a, jnp.broadcast_to(bottom, a[..., :1, :].shape)], axis=-2)
    b3 = jnp.concatenate([b, jnp.broadcast_to(bottom, b[..., :1, :].shape)], axis=-2)
    return (a3 @ b3)[..., :2, :]


def pair_geometric_affine(
    key: jax.Array,
    batch: int,
    height: int,
    width: int,
    crop_scale: tuple[float, float] = (0.8, 1.0),
    hflip_p: float = 0.5,
    rot_degrees: float = 3.0,
    rot_p: float = 0.3,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Sample PairAug's geometric pipeline as one (B, 2, 3) inverse affine.

    Matches the parameter distributions of src/main.py:479-486: area-scale crop
    with aspect ratio 1, horizontal flip, small rotation about the center. The
    three inverse maps are composed so the joint RGB+depth warp interpolates once.
    """
    k_area, k_top, k_left, k_flip, k_rot, k_rotp = jax.random.split(key, 6)
    area = jax.random.uniform(k_area, (batch,), minval=crop_scale[0], maxval=crop_scale[1])
    side = jnp.sqrt(area)  # ratio fixed at 1.0 => same relative side for h and w
    crop_h = side * height
    crop_w = side * width
    top = jax.random.uniform(k_top, (batch,)) * (height - crop_h)
    left = jax.random.uniform(k_left, (batch,)) * (width - crop_w)

    zeros = jnp.zeros((batch,), dtype)
    ones = jnp.ones((batch,), dtype)

    # Crop+resize inverse: out pixel -> crop box coords (half-pixel convention).
    sx = crop_w / width
    sy = crop_h / height
    crop_theta = jnp.stack(
        [
            jnp.stack([sx, zeros, left + 0.5 * sx - 0.5], axis=-1),
            jnp.stack([zeros, sy, top + 0.5 * sy - 0.5], axis=-1),
        ],
        axis=-2,
    )

    # Horizontal flip inverse (self-inverse): x -> W-1-x.
    do_flip = jax.random.bernoulli(k_flip, hflip_p, (batch,)).astype(dtype)
    fsx = 1.0 - 2.0 * do_flip
    ftx = do_flip * (width - 1.0)
    flip_theta = jnp.stack(
        [
            jnp.stack([fsx, zeros, ftx], axis=-1),
            jnp.stack([zeros, ones, zeros], axis=-1),
        ],
        axis=-2,
    )

    # Rotation inverse: rotate by -angle about the image center.
    angle = jax.random.uniform(k_rot, (batch,), minval=-rot_degrees, maxval=rot_degrees)
    angle = angle * jax.random.bernoulli(k_rotp, rot_p, (batch,)).astype(dtype)
    rad = -angle * (jnp.pi / 180.0)
    cos, sin = jnp.cos(rad), jnp.sin(rad)
    cx, cy = (width - 1) / 2.0, (height - 1) / 2.0
    rot_theta = jnp.stack(
        [
            jnp.stack([cos, -sin, cx - cos * cx + sin * cy], axis=-1),
            jnp.stack([sin, cos, cy - sin * cx - cos * cy], axis=-1),
        ],
        axis=-2,
    )

    # Ops applied crop -> flip -> rotate; inverse maps compose innermost-first.
    return _compose(crop_theta, _compose(flip_theta, rot_theta))


def random_gaussian_noise(key, x, std=0.005, p=0.25):
    k_gate, k_noise = jax.random.split(key)
    gate = jax.random.bernoulli(k_gate, p, (x.shape[0],)).astype(x.dtype)
    noise = jax.random.normal(k_noise, x.shape, x.dtype) * std
    return x + noise * gate[:, None, None, None]


def random_gaussian_blur(key, x, kernel_size=3, sigma=(0.1, 2.0), p=0.2):
    """Per-sample depthwise gaussian blur with sampled sigma (PairAug: 3x3)."""
    b, h, w, c = x.shape
    k_gate, k_sigma = jax.random.split(key)
    gate = jax.random.bernoulli(k_gate, p, (b,)).astype(x.dtype)
    sig = jax.random.uniform(k_sigma, (b,), minval=sigma[0], maxval=sigma[1])
    half = kernel_size // 2
    offs = jnp.arange(-half, half + 1, dtype=x.dtype)  # (K,)
    taps = jnp.exp(-0.5 * (offs[None, :] / sig[:, None]) ** 2)
    taps = taps / jnp.sum(taps, axis=1, keepdims=True)  # (B, K)

    def blur_one(img, t):
        # Separable: along W then H, replicate-free zero pad like kornia reflect?
        # kornia uses reflect padding; use edge ('nearest') padding, visually
        # equivalent at 3x3 on natural images.
        pad_w = jnp.pad(img, ((0, 0), (half, half), (0, 0)), mode="edge")
        img = sum(t[i] * pad_w[:, i : i + w, :] for i in range(kernel_size))
        pad_h = jnp.pad(img, ((half, half), (0, 0), (0, 0)), mode="edge")
        img = sum(t[i] * pad_h[i : i + h, :, :] for i in range(kernel_size))
        return img

    blurred = jax.vmap(blur_one)(x, taps)
    return x + (blurred - x) * gate[:, None, None, None]
