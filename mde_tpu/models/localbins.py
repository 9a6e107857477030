"""LocalBins metric-depth head (ZoeDepth-style attractor bins).

Functional re-implementation of the reference's LocalBins stack
(src/network/localbins_net.py:12-121, src/network/localbins_layers.py — itself
MIT-licensed from ZoeDepth): a seed bin regressor on the bottleneck feature, a
chain of attractor layers refining bin centers down the decoder pyramid, and a
conditional log-binomial distribution over bins; depth = sum(p_k * c_k).

Channel contract for MiDaS_small (MIDAS_SETTINGS, localbins_net.py:114-121):
bottleneck 512 (layer_4_rn), then [256, 128, 64, 64] for path_4..path_1.
Everything is NHWC; bin vectors live in the channel (last) axis, so the
attractor delta is one broadcasted subtract + reduce on the VPU instead of the
reference's unsqueeze-heavy NCHW juggling.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..nn.blocks import Conv
from ..ops.resize import resize_bilinear


def exp_attractor(dx, alpha: float = 300.0, gamma: int = 2):
    """dc = exp(-alpha*|dx|^gamma) * dx   (localbins_layers.py:171-183)."""
    return jnp.exp(-alpha * jnp.abs(dx) ** gamma) * dx


def inv_attractor(dx, alpha: float = 300.0, gamma: int = 2):
    """dc = dx / (1 + alpha*dx^gamma)     (localbins_layers.py:186-199)."""
    return dx / (1.0 + alpha * dx**gamma)


class SeedBinRegressorUnnormed(nn.Module):
    """1x1 MLP -> softplus bin centers, unbounded (localbins_layers.py:71-96)."""

    n_bins: int = 16
    mlp_dim: int = 256

    @nn.compact
    def __call__(self, x):
        h = nn.relu(Conv(self.mlp_dim, 1, name="net0")(x))
        centers = nn.softplus(Conv(self.n_bins, 1, name="net2")(h))
        return centers, centers


class SeedBinRegressor(nn.Module):
    """Normed variant: widths -> cumsum edges -> centers, bounded to
    (min_depth, max_depth) (localbins_layers.py:29-68)."""

    n_bins: int = 16
    mlp_dim: int = 256
    min_depth: float = 1e-3
    max_depth: float = 10.0

    @nn.compact
    def __call__(self, x):
        h = nn.relu(Conv(self.mlp_dim, 1, name="net0")(x))
        B = nn.relu(Conv(self.n_bins, 1, name="net2")(h)) + 1e-3
        widths_normed = B / jnp.sum(B, axis=-1, keepdims=True)
        widths = (self.max_depth - self.min_depth) * widths_normed
        widths = jnp.pad(
            widths, ((0, 0), (0, 0), (0, 0), (1, 0)), constant_values=self.min_depth
        )
        edges = jnp.cumsum(widths, axis=-1)
        centers = 0.5 * (edges[..., :-1] + edges[..., 1:])
        return widths_normed, centers


class Projector(nn.Module):
    """1x1 MLP feature -> bin-embedding (localbins_layers.py:99-117)."""

    out_features: int
    mlp_dim: int = 128

    @nn.compact
    def __call__(self, x):
        h = nn.relu(Conv(self.mlp_dim, 1, name="net0")(x))
        return Conv(self.out_features, 1, name="net2")(h)


class AttractorLayerUnnormed(nn.Module):
    """Bin-center refinement by attractor points (localbins_layers.py:201-270)."""

    n_bins: int = 16
    n_attractors: int = 16
    mlp_dim: int = 128
    alpha: float = 300.0
    gamma: int = 2
    kind: str = "sum"
    attractor_type: str = "exp"

    @nn.compact
    def __call__(self, x, b_prev, prev_b_embedding=None):
        if prev_b_embedding is not None:
            prev_b_embedding = resize_bilinear(
                prev_b_embedding, x.shape[1:3], align_corners=True
            )
            x = x + prev_b_embedding
        h = nn.relu(Conv(self.mlp_dim, 1, name="net0")(x))
        A = nn.softplus(Conv(self.n_attractors, 1, name="net2")(h))  # (B,H,W,nA)

        b_centers = resize_bilinear(b_prev, x.shape[1:3], align_corners=True)
        dist = exp_attractor if self.attractor_type == "exp" else inv_attractor
        dx = A[..., :, None] - b_centers[..., None, :]  # (B,H,W,nA,n_bins)
        delta = jnp.sum(dist(dx, self.alpha, self.gamma), axis=-2)
        if self.kind == "mean":
            delta = delta / self.n_attractors
        b_new = b_centers + delta
        return b_new, b_new


class LinearSplitter(nn.Module):
    """Split each bin into ``split_factor`` fractional sub-bins
    (localbins_layers.py:121-169; defined by the reference but unused in its
    live path — provided for API completeness)."""

    prev_nbins: int
    split_factor: int = 2
    mlp_dim: int = 128
    min_depth: float = 1e-3
    max_depth: float = 10.0

    @nn.compact
    def __call__(self, x, b_prev, prev_b_embedding=None):
        if prev_b_embedding is not None:
            prev_b_embedding = resize_bilinear(
                prev_b_embedding, x.shape[1:3], align_corners=True
            )
            x = x + prev_b_embedding
        h = nn.gelu(Conv(self.mlp_dim, 1, name="net0")(x), approximate=False)
        S = nn.relu(Conv(self.prev_nbins * self.split_factor, 1, name="net2")(h)) + 1e-3
        b_, hh, ww, _ = S.shape
        S = S.reshape(b_, hh, ww, self.prev_nbins, self.split_factor)
        S_normed = S / jnp.sum(S, axis=-1, keepdims=True)

        b_prev = resize_bilinear(b_prev, (hh, ww), align_corners=True)
        b_prev = b_prev / jnp.sum(b_prev, axis=-1, keepdims=True)
        b = (b_prev[..., None] * S_normed).reshape(b_, hh, ww, -1)

        widths = (self.max_depth - self.min_depth) * b
        widths = jnp.pad(
            widths, ((0, 0), (0, 0), (0, 0), (1, 0)), constant_values=self.min_depth
        )
        edges = jnp.cumsum(widths, axis=-1)
        centers = 0.5 * (edges[..., :-1] + edges[..., 1:])
        return b, centers


def log_binom(n, k, eps: float = 1e-7):
    """log(nCk) via Stirling (localbins_layers.py:272-276).

    The ``n - k`` difference is clamped to >= 0 before the log: at k == n the
    exact value is 0, but XLA's constant folding can evaluate the two ``+ eps``
    sides at different precisions and produce a tiny *negative* difference,
    turning ``log(n - k + eps)`` into log(<=0) = NaN under jit (observed on the
    CPU backend; eager and torch agree at exactly 0). The clamp is a no-op in
    exact arithmetic for the valid domain k <= n.
    """
    n = n + eps
    k = k + eps
    nk = jnp.maximum(n - k, 0.0)
    return n * jnp.log(n) - k * jnp.log(k) - nk * jnp.log(nk + eps)


class LogBinomial(nn.Module):
    """Binomial distribution over classes from a probability map
    (localbins_layers.py:278-311). Channel-last: class axis is -1."""

    n_classes: int = 256

    @nn.compact
    def __call__(self, x, t=1.0, eps: float = 1e-4):
        # x: (B,H,W) probabilities; t: (B,H,W,1) temperature
        if x.ndim == 3:
            x = x[..., None]
        K = self.n_classes
        k_idx = jnp.arange(K, dtype=x.dtype)
        one_minus_x = jnp.clip(1.0 - x, eps, 1.0)
        x = jnp.clip(x, eps, 1.0)
        y = (
            log_binom(jnp.asarray(K - 1, x.dtype), k_idx)
            + k_idx * jnp.log(x)
            + (K - 1 - k_idx) * jnp.log(one_minus_x)
        )
        return nn.softmax(y / t, axis=-1)


class ConditionalLogBinomial(nn.Module):
    """p/t two-way-normalized conditional log binomial
    (localbins_layers.py:313-361)."""

    n_classes: int = 16
    bottleneck_factor: int = 2
    p_eps: float = 1e-4
    max_temp: float = 50.0
    min_temp: float = 1e-7

    @nn.compact
    def __call__(self, x, cond):
        concat = jnp.concatenate([x, cond], axis=-1)
        bottleneck = (x.shape[-1] + cond.shape[-1]) // self.bottleneck_factor
        h = nn.gelu(Conv(bottleneck, 1, name="mlp0")(concat), approximate=False)
        pt = nn.softplus(Conv(4, 1, name="mlp2")(h))
        p, t = pt[..., :2], pt[..., 2:]
        p = p + self.p_eps
        p = p[..., 0] / (p[..., 0] + p[..., 1])
        t = t + self.p_eps
        t = t[..., 0] / (t[..., 0] + t[..., 1])
        t = (self.max_temp - self.min_temp) * t + self.min_temp
        return LogBinomial(self.n_classes, name="log_binomial_transform")(p, t[..., None])


class LocalBinsBlock(nn.Module):
    """The full LocalBins head (localbins_net.py:12-110).

    ``__call__(out, rel_depth)`` where out = [outconv_activation (B,H,W,1),
    btlnck (layer_4_rn), path_4, path_3, path_2, path_1] and rel_depth (B,H,W).
    Returns metric depth (B,H,W).
    """

    n_bins: int = 16
    max_depth: float = 10.0
    min_depth: float = 1e-3
    bin_embedding_dim: int = 128
    n_attractors: Sequence[int] = (16, 8, 4, 1)
    attractor_alpha: float = 300.0
    attractor_gamma: int = 2
    attractor_kind: str = "sum"
    attractor_type: str = "inv"
    min_temp: float = 5.0
    max_temp: float = 50.0

    @nn.compact
    def __call__(self, out, rel_depth):
        outconv_activation = out[0]
        btlnck = out[1]
        x_blocks = out[2:]

        x = Conv(btlnck.shape[-1], 1, name="conv2")(btlnck)
        _, seed_b_centers = SeedBinRegressorUnnormed(
            self.n_bins, name="seed_bin_regressor"
        )(x)
        b_prev = seed_b_centers
        prev_b_embedding = Projector(self.bin_embedding_dim, name="seed_projector")(x)

        b_centers = b_prev
        for i, xb in enumerate(x_blocks):
            b_embedding = Projector(self.bin_embedding_dim, name=f"projectors_{i}")(xb)
            b, b_centers = AttractorLayerUnnormed(
                self.n_bins,
                int(self.n_attractors[i]),
                alpha=self.attractor_alpha,
                gamma=self.attractor_gamma,
                kind=self.attractor_kind,
                attractor_type=self.attractor_type,
                name=f"attractors_{i}",
            )(b_embedding, b_prev, prev_b_embedding)
            b_prev = b
            prev_b_embedding = b_embedding

        last = outconv_activation
        rel_cond = resize_bilinear(rel_depth[..., None], last.shape[1:3], align_corners=True)
        last = jnp.concatenate([last, rel_cond], axis=-1)
        b_embedding = resize_bilinear(prev_b_embedding, last.shape[1:3], align_corners=True)
        probs = ConditionalLogBinomial(
            self.n_bins,
            min_temp=self.min_temp,
            max_temp=self.max_temp,
            name="conditional_log_binomial",
        )(last, b_embedding)
        b_centers = resize_bilinear(b_centers, probs.shape[1:3], align_corners=True)
        return jnp.sum(probs * b_centers, axis=-1)
