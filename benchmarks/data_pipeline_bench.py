"""Host data-pipeline micro-benchmark: decode throughput of the native C++
batch loader vs the PIL path, and cached-epoch throughput."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import json
import tempfile
import time

import numpy as np


def main(n=32, size=(426, 560), batch=8):
    from mde_tpu.data import DepthDataset, HostLoader, native, synthetic

    root = tempfile.mkdtemp(prefix="dp_bench_")
    synthetic.generate(root, n_train=n, n_test=0, size=size)
    ds = DepthDataset(root + "/train", root + "/train_list.txt")

    results = {}
    if not native.available():
        native.build()

    def run(tag, **kwargs):
        loader = HostLoader(ds, batch_size=batch, num_workers=4, **kwargs)
        # warm epoch for cache variants
        if kwargs.get("cache"):
            for _ in loader:
                pass
        t0 = time.perf_counter()
        count = 0
        for b in loader:
            count += b["rgb"].shape[0]
        results[tag] = round(count / (time.perf_counter() - t0), 1)

    run("native_decode")
    run("cached_epoch", cache=True)
    # Force the PIL path by hiding the native size probe
    loader = HostLoader(ds, batch_size=batch, num_workers=4)
    loader._native_hw = None
    t0 = time.perf_counter()
    count = 0
    for b in loader:
        count += b["rgb"].shape[0]
    results["pil_decode"] = round(count / (time.perf_counter() - t0), 1)
    print(json.dumps({"unit": "images/sec", **results}))


if __name__ == "__main__":
    main()
