"""Qualitative visualization — equivalent of ``python src/visualize.py``.

Loads the configured checkpoint, forwards the first N_SAMPLES train images, and
writes per-sample PNGs to visualization/figures with the reference's naming and
colormaps (src/visualize.py:103-151): ``{i:06d}_gtd.png`` (plasma ground truth),
``{i:06d}_{model_name}_pred.png`` (plasma prediction),
``{i:06d}_{model_name}_lmap.png`` (hot per-pixel SI loss map). The 2x2-grid
``visualize_sample`` figure is also provided.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from ..data import DepthDataset, HostLoader
from ..data.transforms import preprocess_eval
from ..losses import per_pixel_scale_invariant_loss
from ..parallel import make_training_mesh
from ..train.trainer import _apply_model
from .common import bootstrap_model, parse_config, resolve_paths

N_SAMPLES = 100


def visualize_sample(rgb_image, pred_depth, gt_depth, loss_map=None, save_path=None):
    """2x2 grid: RGB / loss map / GT depth / predicted depth (src/visualize.py:41-101)."""
    if rgb_image.shape[0] == 3:
        rgb_image = np.transpose(rgb_image, (1, 2, 0))
    normalized = (rgb_image - rgb_image.min()) / (rgb_image.max() - rgb_image.min() + 1e-6)
    fig, axes = plt.subplots(2, 2, figsize=(12, 10))
    axes = axes.flatten()
    axes[0].imshow(normalized)
    axes[0].set_title("Input RGB Image")
    if loss_map is not None:
        im = axes[1].imshow(loss_map, cmap="hot")
        axes[1].set_title("Per-pixel Loss Map")
        plt.colorbar(im, ax=axes[1], fraction=0.046, pad=0.04)
    axes[2].imshow(gt_depth, cmap="plasma")
    axes[2].set_title("Ground Truth Depth")
    axes[3].imshow(pred_depth, cmap="plasma")
    axes[3].set_title("Predicted Depth")
    for ax in axes:
        ax.axis("off")
    plt.tight_layout()
    if save_path:
        os.makedirs(os.path.dirname(save_path), exist_ok=True)
        plt.savefig(save_path, bbox_inches="tight", dpi=300)
        plt.close(fig)
    else:  # pragma: no cover
        plt.show()


def save_images(pred_depth, gt_depth, index, model_name, loss_map=None, save_path="."):
    plt.imsave(os.path.join(save_path, f"{index:06d}_gtd.png"), gt_depth, cmap="plasma")
    plt.imsave(
        os.path.join(save_path, f"{index:06d}_{model_name}_pred.png"), pred_depth, cmap="plasma"
    )
    if loss_map is not None:
        plt.imsave(
            os.path.join(save_path, f"{index:06d}_{model_name}_lmap.png"), loss_map, cmap="hot"
        )


def main():
    def extra(p):
        p.add_argument("--n-samples", type=int, default=N_SAMPLES)
        p.add_argument("--output-dir", default="visualization")

    cfg, args = parse_config("Visualize predictions + loss maps", extra)
    paths = resolve_paths(cfg)
    model_name = cfg.experiment.model_name
    ckpt = os.path.join(paths["results_dir"], f"best_model_{model_name}.pth")
    print(f"Loading model {cfg.model.model_type} from {ckpt}")
    mesh = make_training_mesh(cfg, int(cfg.training.batch_size))
    model, state, _ = bootstrap_model(cfg, mesh, checkpoint=ckpt)

    dataset = DepthDataset(paths["train_dir"], paths["train_list"], has_gt=True)
    loader = HostLoader(dataset, indices=range(min(args.n_samples, len(dataset))),
                        batch_size=1, num_workers=2)

    figures_dir = os.path.join(args.output_dir, "figures")
    os.makedirs(figures_dir, exist_ok=True)
    input_size = tuple(int(s) for s in cfg.framework.input_size)

    for i, batch in enumerate(loader):
        rgb, depth_gt = preprocess_eval(
            jnp.asarray(batch["rgb"]), jnp.asarray(batch["depth"]), input_size=input_size
        )
        pred, _ = _apply_model(model, state.params, state.batch_stats, rgb, False)
        pred_np = np.asarray(pred[0])
        gt_np = np.asarray(depth_gt[0])
        loss_map = np.asarray(
            per_pixel_scale_invariant_loss(
                jnp.maximum(pred[0], 1e-6), jnp.maximum(depth_gt[0], 1e-6)
            )
        )
        save_images(pred_np, gt_np, i, model_name, loss_map, figures_dir)
    print("Visualization saved to", args.output_dir)


if __name__ == "__main__":
    main()
