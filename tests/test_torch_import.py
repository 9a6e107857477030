"""Torch checkpoint ingestion: numerical forward parity after importing a
torch SimpleUNet's weights into the Flax model — validates every layout
conversion (conv OIHW->HWIO, BN stats) and the strict=False merge plumbing."""

import numpy as np
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from mde_tpu.models import SimpleUNet
from mde_tpu.train.torch_import import (
    import_state_dict,
    load_torch_state_dict,
    map_simple_unet_key,
    remove_module_prefix,
)


class TorchUNetBlock(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
        self.bn2 = tnn.BatchNorm2d(cout)

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        return torch.relu(self.bn2(self.conv2(x)))


class TorchSimpleUNet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.enc1 = TorchUNetBlock(3, 64)
        self.enc2 = TorchUNetBlock(64, 128)
        self.dec2 = TorchUNetBlock(128 + 64, 64)
        self.dec1 = TorchUNetBlock(64, 32)
        self.final = tnn.Conv2d(32, 1, 1)
        self.pool = tnn.MaxPool2d(2)

    def forward(self, x):
        enc1 = self.enc1(x)
        x = self.pool(enc1)
        x = self.enc2(x)
        x = tnn.functional.interpolate(x, size=enc1.shape[2:], mode="bilinear", align_corners=True)
        x = torch.cat([x, enc1], dim=1)
        x = self.dec2(x)
        x = self.dec1(x)
        x = self.final(x)
        return torch.sigmoid(x) * 10


def test_simple_unet_forward_parity(tmp_path, rng):
    torch.manual_seed(0)
    tmodel = TorchSimpleUNet().eval()
    # Give BN stats non-trivial values so their import is actually exercised.
    with torch.no_grad():
        tmodel(torch.randn(4, 3, 32, 48))
        tmodel.train()
        tmodel(torch.randn(4, 3, 32, 48))
        tmodel.eval()
    ckpt = tmp_path / "unet.pth"
    torch.save({"model_state_dict": tmodel.state_dict()}, ckpt)

    model = SimpleUNet()
    x_np = rng.standard_normal((2, 32, 48, 3)).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(x_np), train=False)

    sd = load_torch_state_dict(str(ckpt))
    params, stats, report = import_state_dict(
        sd, variables["params"], variables["batch_stats"], map_simple_unet_key
    )
    # num_batches_tracked buffers are expected to be unmapped; nothing else.
    assert all("num_batches_tracked" in k for k in report["unmapped"]), report["unmapped"]
    assert not report["shape_mismatch"]
    assert report["loaded"] == sum(
        1 for k in sd if "num_batches_tracked" not in k
    )

    got = np.asarray(
        model.apply({"params": params, "batch_stats": stats}, jnp.asarray(x_np), train=False)
    )
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x_np.transpose(0, 3, 1, 2))).squeeze(1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_module_prefix_stripped():
    assert remove_module_prefix("module.enc1.conv1.weight") == "enc1.conv1.weight"
    assert remove_module_prefix("enc1.module.x") == "enc1.module.x"
