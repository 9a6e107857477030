"""Reference-naming torch reconstructions of the LocalBins metric-depth head
(src/network/localbins_net.py:12-121, localbins_layers.py:29-361), the DGR
edge-sharpening block (src/network/midas_net_custom.py:14-43), and the full
MidasNet_small with use_lb / use_dgr (midas_net_custom.py:45-185).

Test fixtures only: these exist so the production torch-import maps can be
verified end to end against the exact state_dict key grammar and forward
semantics a reference checkpoint would carry. Encoder/decoder pieces are
reused from torch_flagship_ref.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F

from tests.torch_flagship_ref import (
    EffnetLite3Sliced,
    FeatureFusionBlock_custom,
    _Scratch,
)


# ---------------------------------------------------------------------------
# localbins_layers.py reconstructions (reference module/key naming)
# ---------------------------------------------------------------------------


class SeedBinRegressorUnnormedTorch(nn.Module):
    """localbins_layers.py:71-96 — 1x1 MLP -> softplus unbounded centers."""

    def __init__(self, in_features, n_bins=16, mlp_dim=256):
        super().__init__()
        self._net = nn.Sequential(
            nn.Conv2d(in_features, mlp_dim, 1),
            nn.ReLU(True),
            nn.Conv2d(mlp_dim, n_bins, 1),
            nn.Softplus(),
        )

    def forward(self, x):
        centers = self._net(x)
        return centers, centers


class ProjectorTorch(nn.Module):
    """localbins_layers.py:99-117."""

    def __init__(self, in_features, out_features, mlp_dim=128):
        super().__init__()
        self._net = nn.Sequential(
            nn.Conv2d(in_features, mlp_dim, 1),
            nn.ReLU(True),
            nn.Conv2d(mlp_dim, out_features, 1),
        )

    def forward(self, x):
        return self._net(x)


def _inv_attractor(dx, alpha, gamma):
    return dx / (1.0 + alpha * dx.pow(gamma))


def _exp_attractor(dx, alpha, gamma):
    return torch.exp(-alpha * dx.abs().pow(gamma)) * dx


class AttractorLayerUnnormedTorch(nn.Module):
    """localbins_layers.py:201-270 (non-memory-efficient branch)."""

    def __init__(self, in_features, n_bins, n_attractors=16, mlp_dim=128,
                 alpha=300.0, gamma=2, kind="sum", attractor_type="exp"):
        super().__init__()
        self.alpha, self.gamma = alpha, gamma
        self.kind, self.attractor_type = kind, attractor_type
        self._net = nn.Sequential(
            nn.Conv2d(in_features, mlp_dim, 1),
            nn.ReLU(True),
            nn.Conv2d(mlp_dim, n_attractors, 1),
            nn.Softplus(),
        )

    def forward(self, x, b_prev, prev_b_embedding=None):
        if prev_b_embedding is not None:
            prev_b_embedding = F.interpolate(
                prev_b_embedding, x.shape[-2:], mode="bilinear", align_corners=True
            )
            x = x + prev_b_embedding
        A = self._net(x)
        b_centers = F.interpolate(
            b_prev, A.shape[-2:], mode="bilinear", align_corners=True
        )
        dist = _exp_attractor if self.attractor_type == "exp" else _inv_attractor
        delta = dist(A.unsqueeze(2) - b_centers.unsqueeze(1), self.alpha, self.gamma)
        func = {"mean": torch.mean, "sum": torch.sum}[self.kind]
        b_new = b_centers + func(delta, dim=1)
        return b_new, b_new


class LogBinomialTorch(nn.Module):
    """localbins_layers.py:278-311 (buffers k_idx / K_minus_1 included so the
    synthesized state dict carries the same dead keys a real one does)."""

    def __init__(self, n_classes=256):
        super().__init__()
        self.K = n_classes
        self.register_buffer("k_idx", torch.arange(n_classes).view(1, -1, 1, 1))
        self.register_buffer("K_minus_1", torch.tensor([n_classes - 1.0]).view(1, -1, 1, 1))

    def forward(self, x, t=1.0, eps=1e-4):
        if x.ndim == 3:
            x = x.unsqueeze(1)
        one_minus_x = torch.clamp(1 - x, eps, 1)
        x = torch.clamp(x, eps, 1)

        def log_binom(n, k, e=1e-7):
            n = n + e
            k = k + e
            return n * torch.log(n) - k * torch.log(k) - (n - k) * torch.log(n - k + e)

        y = (
            log_binom(self.K_minus_1, self.k_idx)
            + self.k_idx * torch.log(x)
            + (self.K - 1 - self.k_idx) * torch.log(one_minus_x)
        )
        return torch.softmax(y / t, dim=1)


class ConditionalLogBinomialTorch(nn.Module):
    """localbins_layers.py:313-361."""

    def __init__(self, in_features, condition_dim, n_classes=16,
                 bottleneck_factor=2, p_eps=1e-4, max_temp=50.0, min_temp=1e-7):
        super().__init__()
        self.p_eps, self.max_temp, self.min_temp = p_eps, max_temp, min_temp
        self.log_binomial_transform = LogBinomialTorch(n_classes)
        bottleneck = (in_features + condition_dim) // bottleneck_factor
        self.mlp = nn.Sequential(
            nn.Conv2d(in_features + condition_dim, bottleneck, 1),
            nn.GELU(),
            nn.Conv2d(bottleneck, 4, 1),
            nn.Softplus(),
        )

    def forward(self, x, cond):
        pt = self.mlp(torch.cat((x, cond), dim=1))
        p, t = pt[:, :2], pt[:, 2:]
        p = p + self.p_eps
        p = p[:, 0] / (p[:, 0] + p[:, 1])
        t = t + self.p_eps
        t = t[:, 0] / (t[:, 0] + t[:, 1])
        t = t.unsqueeze(1)
        t = (self.max_temp - self.min_temp) * t + self.min_temp
        return self.log_binomial_transform(p, t)


class LocalBinsBlockTorch(nn.Module):
    """localbins_net.py:12-110 with MiDaS_small channels (512, 256, 128, 64, 64)
    and the reference's live config: n_bins 16, bin_embedding 128, inv
    attractors [16, 8, 4, 1], sum, min/max temp 5/50."""

    def __init__(self, channels=(512, 256, 128, 64, 64), n_bins=16,
                 bin_embedding_dim=128, n_attractors=(16, 8, 4, 1),
                 attractor_alpha=300.0, attractor_gamma=2,
                 attractor_kind="sum", attractor_type="inv",
                 min_temp=5.0, max_temp=50.0):
        super().__init__()
        btlnck, rest = channels[0], channels[1:]
        self.conv2 = nn.Conv2d(btlnck, btlnck, 1)
        self.seed_bin_regressor = SeedBinRegressorUnnormedTorch(btlnck, n_bins)
        self.seed_projector = ProjectorTorch(btlnck, bin_embedding_dim)
        self.projectors = nn.ModuleList(
            [ProjectorTorch(c, bin_embedding_dim) for c in rest]
        )
        self.attractors = nn.ModuleList([
            AttractorLayerUnnormedTorch(
                bin_embedding_dim, n_bins, n_attractors=n_attractors[i],
                alpha=attractor_alpha, gamma=attractor_gamma,
                kind=attractor_kind, attractor_type=attractor_type,
            )
            for i in range(len(rest))
        ])
        self.conditional_log_binomial = ConditionalLogBinomialTorch(
            2, bin_embedding_dim, n_classes=n_bins,
            min_temp=min_temp, max_temp=max_temp,
        )

    def forward(self, out, rel_depth):
        outconv_activation, btlnck, x_blocks = out[0], out[1], out[2:]
        x = self.conv2(btlnck)
        _, seed_b_centers = self.seed_bin_regressor(x)
        b_prev = seed_b_centers
        prev_b_embedding = self.seed_projector(x)

        b_centers = b_prev
        b_embedding = prev_b_embedding
        for projector, attractor, xb in zip(self.projectors, self.attractors, x_blocks):
            b_embedding = projector(xb)
            b, b_centers = attractor(b_embedding, b_prev, prev_b_embedding)
            b_prev = b
            prev_b_embedding = b_embedding

        last = outconv_activation
        rel_cond = F.interpolate(
            rel_depth.unsqueeze(1), size=last.shape[2:], mode="bilinear",
            align_corners=True,
        )
        last = torch.cat([last, rel_cond], dim=1)
        b_embedding = F.interpolate(
            b_embedding, last.shape[-2:], mode="bilinear", align_corners=True
        )
        probs = self.conditional_log_binomial(last, b_embedding)
        b_centers = F.interpolate(
            b_centers, probs.shape[-2:], mode="bilinear", align_corners=True
        )
        return torch.sum(probs * b_centers, dim=1)


# ---------------------------------------------------------------------------
# DGR (midas_net_custom.py:14-43)
# ---------------------------------------------------------------------------


class DGRTorch(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.lap2 = nn.Conv2d(ch, ch, 3, 1, 1, bias=False, groups=ch)
        self.lap3 = nn.Conv2d(ch, ch, 3, 1, 1, bias=False, groups=ch)
        with torch.no_grad():
            lap = torch.tensor([[0, 1, 0], [1, -4, 1], [0, 1, 0]], dtype=torch.float32)
            self.lap2.weight.copy_(lap.repeat(ch, 1, 1, 1))
            self.lap3.weight.copy_((lap * lap).repeat(ch, 1, 1, 1))
        for p in self.lap2.parameters():
            p.requires_grad = False
        for p in self.lap3.parameters():
            p.requires_grad = False
        self.recalib = nn.Sequential(
            nn.AdaptiveAvgPool2d(1),
            nn.Conv2d(3 * ch, ch // 8, 1), nn.GELU(),
            nn.Conv2d(ch // 8, 3 * ch, 1), nn.Sigmoid(),
        )
        self.spatial = nn.Conv2d(3 * ch, 3 * ch, 3, 1, 1, groups=3 * ch)

    def forward(self, x):
        l2, l3 = self.lap2(x), self.lap3(x)
        f = torch.cat([x, l2, l3], 1)
        f = f * self.recalib(f)
        f = self.spatial(f)
        return f[:, : x.shape[1]] + x


# ---------------------------------------------------------------------------
# Full MidasNet_small with use_lb / use_dgr (midas_net_custom.py:45-185)
# ---------------------------------------------------------------------------


class MidasNetSmallTorch(nn.Module):
    """Reference state_dict key grammar for the non-semantics small model:
    pretrained.layer{1..4} (sliced lite3), scratch.layerX_rn / refinenetX /
    output_conv.{0,2,4}, dgr{1..4}, local_bins.*."""

    def __init__(self, features=64, use_lb=False, use_dgr=False):
        super().__init__()
        self.use_lb, self.use_dgr = use_lb, use_dgr
        self.pretrained = EffnetLite3Sliced()
        self.scratch = _Scratch()
        chans = (32, 48, 136, 384)
        mults = (1, 2, 4, 8)
        for i, (c, m) in enumerate(zip(chans, mults)):
            self.scratch.add_module(
                f"layer{i + 1}_rn", nn.Conv2d(c, features * m, 3, 1, 1, bias=False)
            )
        self.scratch.refinenet4 = FeatureFusionBlock_custom(features * 8, expand=True)
        self.scratch.refinenet3 = FeatureFusionBlock_custom(features * 4, expand=True)
        self.scratch.refinenet2 = FeatureFusionBlock_custom(features * 2, expand=True)
        self.scratch.refinenet1 = FeatureFusionBlock_custom(features, expand=False)
        if use_dgr:
            self.dgr1 = DGRTorch(features)
            self.dgr2 = DGRTorch(features * 2)
            self.dgr3 = DGRTorch(features * 4)
            self.dgr4 = DGRTorch(features * 8)
        # Full (pre-surgery) head: convs at 0/2/4 (midas_net_custom.py:105-113).
        self.scratch.output_conv = nn.Sequential(
            nn.Conv2d(features, features // 2, 3, 1, 1),
            nn.Identity(),  # Interpolate(scale_factor=2) — applied in forward
            nn.Conv2d(features // 2, 32, 3, 1, 1),
            nn.ReLU(False),
            nn.Conv2d(32, 1, 1),
            nn.ReLU(True),
            nn.Identity(),
        )
        if use_lb:
            self.local_bins = LocalBinsBlockTorch(
                (features * 8, features * 4, features * 2, features, features)
            )

    def forward(self, x):
        l1, l2, l3, l4 = self.pretrained(x)
        r1 = self.scratch.layer1_rn(l1)
        r2 = self.scratch.layer2_rn(l2)
        r3 = self.scratch.layer3_rn(l3)
        r4 = self.scratch.layer4_rn(l4)
        if self.use_dgr:
            r1, r2, r3, r4 = self.dgr1(r1), self.dgr2(r2), self.dgr3(r3), self.dgr4(r4)
        p4 = self.scratch.refinenet4(r4)
        p3 = self.scratch.refinenet3(p4, r3)
        p2 = self.scratch.refinenet2(p3, r2)
        p1 = self.scratch.refinenet1(p2, r1)
        h = self.scratch.output_conv[0](p1)
        h = F.interpolate(h, scale_factor=2, mode="bilinear", align_corners=False)
        h = F.relu(self.scratch.output_conv[2](h))
        out = F.relu(self.scratch.output_conv[4](h))
        if self.use_lb:
            rel = out.squeeze(1)
            return self.local_bins([out, r4, p4, p3, p2, p1], rel)
        return out.squeeze(1)
