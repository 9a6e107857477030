"""End-to-end tools smoke on the REAL attached accelerator.

The CPU test suite drives the full train -> predict -> csv -> evaluate tool
pipeline on the virtual mesh (tests/test_tools.py); the driver compile-checks
``entry()`` and benches isolated train steps. What neither proves is the whole
*product* running on the actual chip: config load, synthetic 426x560 data, the
flagship MidasNetSemantics (config.yaml headline: MiDaS_small + dinov2_vits14)
trained for 2 epochs at the real 448x576 geometry with early-stopping +
best-checkpointing, 426x560 prediction dump, byte-compatible
predictions.csv, and the evaluation protocol (src/evaluation.py:99-185
semantics) — all through the same entry points a user would run.

This script is that proof. Run from the repo root with the TPU attached:

    python benchmarks/tpu_e2e_smoke.py

Prints PASS/FAIL per stage and exits nonzero on any failure. Budget ~30-60 min
on a cold remote-compile session (flagship train + eval + predict programs).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    import numpy as np
    import pandas as pd

    from mde_tpu.data import synthetic

    platform = jax.devices()[0].platform
    print(f"platform={platform} devices={len(jax.devices())}", flush=True)

    root = tempfile.mkdtemp(prefix="tpu_e2e_")
    data_dir = os.path.join(root, "data")
    # 24 train pairs -> 85/15 split 20/4 (5 steps/epoch at bs4); 3 test images.
    synthetic.generate(data_dir, n_train=24, n_test=3, size=(426, 560))
    cfg_path = os.path.join(root, "config.yaml")
    with open(cfg_path, "w") as f:
        f.write(f"""
paths:
  data_dir: {data_dir}
  results_dir: {root}/results
  predictions_dir: {root}/predictions
experiment:
  model_name: flagship_smoke
  wandb_disable: True
training:
  n_epoch: 2
  batch_size: 4
  early_stopping:
    patience: 3
    min_delta: 1e-4
model:
  model_type: MiDaS_small
  dinov2_type: dinov2_vits14
framework:
  input_size: [448, 576]
  native_size: [426, 560]
  num_workers: 2
  mesh: {{data: -1, model: 1}}
opt:
  evaluate_best_model: true
""")

    failures = []

    def stage(name, fn):
        t0 = time.time()
        try:
            fn()
            print(f"[{name}] PASS  ({time.time() - t0:.0f}s)", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            failures.append(name)
            print(f"[{name}] FAIL  {type(e).__name__}: {e}", flush=True)

    cwd = os.getcwd()
    os.chdir(root)
    try:
        def run_tool(mod_main, argv):
            old = sys.argv
            sys.argv = argv
            try:
                mod_main()
            finally:
                sys.argv = old

        def train():
            from mde_tpu.tools import main as main_tool

            run_tool(main_tool.main, ["main.py", "--config", cfg_path])
            ckpt = os.path.join(root, "results", "best_model_flagship_smoke.pth")
            assert os.path.exists(ckpt), "best checkpoint missing"
            # main's tail dumps test predictions at the native size
            preds = sorted(os.listdir(os.path.join(root, "predictions")))
            assert preds == [f"test_{i:06d}_depth.npy" for i in range(3)], preds
            arr = np.load(os.path.join(root, "predictions", preds[0]))
            assert arr.shape == (426, 560), arr.shape
            assert np.isfinite(arr).all() and (arr >= 0).all()
            metrics = os.path.join(root, "results", "validation_metrics.txt")
            assert os.path.exists(metrics), "opt.evaluate_best_model output missing"
            print("  " + ", ".join(open(metrics).read().split("\n")[:2]), flush=True)

        def predict_csv():
            from mde_tpu.tools import generate_predictions as gp

            run_tool(gp.main, ["generate_predictions.py", "--config", cfg_path])
            df = pd.read_csv(os.path.join(root, "predictions.csv"))
            assert df.shape == (3, 2) and list(df.columns) == ["id", "Depths"]

        def evaluate():
            from mde_tpu.tools import evaluation as ev

            run_tool(ev.main, ["evaluation.py", "--config", cfg_path])

        stage("train+dump", train)
        stage("predict+csv", predict_csv)
        stage("evaluation", evaluate)
    finally:
        os.chdir(cwd)
        shutil.rmtree(root, ignore_errors=True)

    print(json.dumps({"tpu_e2e_smoke": "FAIL" if failures else "PASS",
                      "failures": failures}), flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
