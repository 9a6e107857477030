"""Export the configured model + checkpoint as an AOT serving artifact.

Beyond the reference's public surface (it has no deployment artifact — serving
means re-running the training codebase): bakes the best checkpoint's weights
into per-bucket serialized StableHLO programs (train/export.py) that
``tools/serve.py --exported model.mdex`` runs with no model code and no
checkpoint access.

    python -m mde_tpu.tools.export_model --config ... --data-dir ... \
        --out results/model.mdex [--max-batch 8] [--platforms tpu cpu]
"""

from __future__ import annotations

import os

from ..train.export import export_predict, save_exported
from .common import bootstrap_model, parse_config, resolve_paths
from .serve import _buckets


def main():
    def extra(p):
        p.add_argument("--out", required=True, help="output .mdex path")
        p.add_argument("--max-batch", type=int, default=8)
        p.add_argument("--platforms", nargs="*", default=None,
                       help="target platforms (default: current backend); "
                            "e.g. --platforms cpu tpu for a dual artifact")
        p.add_argument("--allow-uninitialized", action="store_true",
                       help="export random weights when no checkpoint exists "
                            "(dev/smoke only)")

    cfg, args = parse_config("Export an AOT serving artifact", extra=extra)
    paths = resolve_paths(cfg)
    ckpt = os.path.join(
        paths["results_dir"], f"best_model_{cfg.experiment.model_name}.pth"
    )
    if not os.path.exists(ckpt):
        if not args.allow_uninitialized:
            raise FileNotFoundError(
                f"checkpoint {ckpt} not found; refusing to export a randomly "
                "initialized model (--allow-uninitialized to override)"
            )
        ckpt = None
    model, state, _ = bootstrap_model(cfg, checkpoint=ckpt)
    buckets = _buckets(args.max_batch)
    print(f"Exporting {cfg.experiment.model_name} buckets {buckets} "
          f"(checkpoint: {ckpt or 'NONE — random weights'})")
    bundle = export_predict(model, cfg, state, buckets, platforms=args.platforms)
    save_exported(args.out, bundle)
    size_mb = os.path.getsize(args.out) / 1e6
    print(f"Wrote {args.out} ({size_mb:.1f} MB, platforms "
          f"{bundle['meta']['platforms']})")


if __name__ == "__main__":
    main()
