"""Kaggle submission encoder — bit-compatible with create_prediction_csv.py.

Format contract (reference create_prediction_csv.py:16-55, the
"bit-compatibility contract" of SURVEY.md §2.1): for each test list pair, load
``predictions/<depth>.npy``, flatten, numpy-round to 2 decimals, join the
values formatted "%.2f" with commas, UTF-8 encode, zlib-compress at level 9,
base64 — one row per image with id = depth filename sans extension
(``test_NNNNNN_depth``) and column name ``Depths``.
"""

from __future__ import annotations

import argparse
import base64
import os
import zlib

import numpy as np
import pandas as pd


def compress_depth_values(depth_values) -> str:
    depth_bytes = ",".join(f"{x:.2f}" for x in depth_values).encode("utf-8")
    return base64.b64encode(zlib.compress(depth_bytes, level=9)).decode("utf-8")


def process_depth_maps(predictions_dir: str, test_list_file: str, output_csv: str) -> None:
    with open(test_list_file, "r") as f:
        file_pairs = [line.strip().split() for line in f if line.strip()]

    ids, depths_list = [], []
    for _, depth_path in file_pairs:
        file_id = os.path.splitext(os.path.basename(depth_path))[0]
        depth = np.load(os.path.join(predictions_dir, depth_path))
        flattened = np.round(depth.flatten(), 2)
        ids.append(file_id)
        depths_list.append(compress_depth_values(flattened))

    df = pd.DataFrame({"id": ids, "Depths": depths_list})
    df.to_csv(output_csv, index=False)
    print(f"CSV file saved to: {output_csv}")
    print(f"Shape of the CSV: {df.shape}")


def main():
    p = argparse.ArgumentParser(description="Encode predictions.csv for Kaggle")
    p.add_argument("--predictions-dir", default="predictions")
    p.add_argument("--test-list", default="data/test_list.txt")
    p.add_argument("--output", default="predictions.csv")
    args = p.parse_args()
    process_depth_maps(args.predictions_dir, args.test_list, args.output)


if __name__ == "__main__":
    main()
