"""Threaded host loader with double-buffered device prefetch.

Replaces the reference's ``DataLoader(num_workers=4, pin_memory=True,
persistent_workers=True)`` (src/main.py:622-646). Worker *threads* (PNG decode and
np.load release the GIL) fill a bounded queue of ready uint8/float32 numpy
batches; the iterator hands them to JAX, optionally already placed on device with
a sharding so the H2D copy overlaps the previous step. There is no per-step
blocking ``.to(device)`` — the TPU equivalent of pin_memory+non_blocking is
device_put against a committed sharding ahead of use.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Sequence

import numpy as np

from .dataset import DepthDataset


class HostLoader:
    def __init__(
        self,
        dataset: DepthDataset,
        indices: Optional[Sequence[int]] = None,
        batch_size: int = 4,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 4,
        seed: int = 0,
        prefetch_depth: int = 2,
        cache: bool = False,
        use_native: Optional[bool] = None,
        process_shard: Optional[tuple[int, int]] = None,
    ):
        self.dataset = dataset
        self.indices = np.asarray(indices if indices is not None else np.arange(len(dataset)))
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch_depth = prefetch_depth
        self._rng = np.random.default_rng(seed)
        # Optional in-RAM decode cache: the full CIL train set is ~17 GB of
        # raw uint8+f32 (24k x 426x560), far below typical host RAM; epochs
        # after the first skip PNG/NPY decode entirely.
        self.cache = cache
        self._cache: dict[int, tuple] = {}
        self._cache_lock = threading.Lock()
        # use_native: route whole-batch decode through native/depthio.cpp.
        # benchmarks/data_pipeline_bench.py measures both paths; on a 1-core
        # host libpng-backed PIL decodes ~25% faster than our scalar unfilter,
        # while the native pool avoids per-sample Python object churn on
        # multi-core hosts. The cache (above) dominates both after epoch 1.
        # Default (None) picks by core count per that measurement.
        if use_native is None:
            import os

            use_native = (os.cpu_count() or 1) > 1
        self._native_hw = "unprobed" if use_native else None
        # process_shard=(process_index, process_count): multi-host mode. Every
        # process computes the SAME global batch order (identical indices/seed/
        # shuffle state — the constructor arguments must match across
        # processes) and decodes only its contiguous row block of each batch;
        # parallel.shard_batch reassembles the blocks into one global array
        # (parallel/distributed.py::local_row_block documents the layout).
        # batch_size stays the GLOBAL batch size; yielded batches carry
        # batch_size/process_count rows.
        if process_shard is not None:
            p, n = process_shard
            if not (0 <= p < n):
                raise ValueError(f"process_shard {process_shard}: need 0 <= id < count")
        self.process_shard = process_shard

    def __len__(self) -> int:
        n = len(self.indices)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    @property
    def num_samples(self) -> int:
        if self.drop_last:
            return len(self) * self.batch_size
        return len(self.indices)

    def _batch_indices(self) -> list[tuple[np.ndarray, bool]]:
        """Batches as (indices, replicated) pairs; ``replicated`` marks a
        process-sharded remainder batch yielded in full on every process."""
        order = self.indices.copy()
        if self.shuffle:
            self._rng.shuffle(order)
        batches = [
            order[i : i + self.batch_size] for i in range(0, len(order), self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        if self.process_shard is not None:
            # Multi-host: each process takes its contiguous row block. A batch
            # that does not split evenly (e.g. the 649 % 4 = 1 test remainder)
            # is yielded IN FULL on every process and tagged for replicated
            # placement — the same correct-but-not-parallel remainder policy
            # shard_batch applies single-process.
            p, n = self.process_shard
            sliced = []
            for b in batches:
                if len(b) % n:
                    sliced.append((b, True))
                else:
                    per = len(b) // n
                    sliced.append((b[p * per : (p + 1) * per], False))
            return sliced
        return [(b, False) for b in batches]

    def _native_size(self):
        """Probe + cache the image size for the native batch decoder; None
        disables the native path (lib missing or probe failed)."""
        if self._native_hw == "unprobed":
            self._native_hw = None
            try:
                from . import native

                if native.available():
                    rgb_path, _ = self.dataset.paths(int(self.indices[0]))
                    self._native_hw = native.png_info(rgb_path)
            except (IOError, OSError, IndexError):
                self._native_hw = None
        return self._native_hw

    def _assemble(self, idxs: np.ndarray) -> dict:
        names = [self.dataset.entries[int(i)] for i in idxs]
        if self.cache:
            with self._cache_lock:
                cached = [self._cache.get(int(i)) for i in idxs]
            if all(c is not None for c in cached):
                batch = {"rgb": np.stack([c[0] for c in cached]), "names": names}
                if self.dataset.has_gt:
                    batch["depth"] = np.stack([c[1] for c in cached])
                return batch
        hw = self._native_size()
        if hw is not None:
            from . import native

            paths = [self.dataset.paths(int(i)) for i in idxs]
            try:
                # The C++ pool already parallelizes across the batch; decoding
                # here stays single-threaded per call.
                rgb, depth = native.load_batch(
                    [p[0] for p in paths],
                    [p[1] for p in paths] if self.dataset.has_gt else None,
                    hw[0], hw[1], workers=1,
                )
                batch = {"rgb": rgb, "names": names}
                if depth is not None:
                    batch["depth"] = depth
                self._store_cache(idxs, batch)
                return batch
            except IOError:
                pass  # odd-sized or unsupported file: fall through to PIL
        rgbs, depths = [], []
        for i in idxs:
            rgb, depth, _ = self.dataset.load(int(i))
            rgbs.append(rgb)
            depths.append(depth)
        batch = {"rgb": np.stack(rgbs), "names": names}
        if self.dataset.has_gt:
            batch["depth"] = np.stack(depths)
        self._store_cache(idxs, batch)
        return batch

    def _store_cache(self, idxs, batch) -> None:
        if not self.cache:
            return
        with self._cache_lock:
            for pos, i in enumerate(idxs):
                if int(i) not in self._cache:
                    self._cache[int(i)] = (
                        batch["rgb"][pos],
                        batch["depth"][pos] if "depth" in batch else None,
                    )

    def __iter__(self) -> Iterator[dict]:
        batches = self._batch_indices()
        if not batches:
            return
        task_q: queue.Queue = queue.Queue()
        for pos, (idxs, replicated) in enumerate(batches):
            task_q.put((pos, idxs, replicated))
        # Bound host memory: at most prefetch_depth + num_workers batches may be
        # decoded but not yet consumed.
        inflight = threading.Semaphore(self.prefetch_depth + self.num_workers)
        # Per-slot result store so batches are yielded in order even though
        # workers finish out of order.
        results: dict[int, dict] = {}
        results_cv = threading.Condition()
        stop = threading.Event()

        def worker():
            while not stop.is_set():
                inflight.acquire()
                try:
                    pos, idxs, replicated = task_q.get_nowait()
                except queue.Empty:
                    inflight.release()
                    return
                batch = self._assemble(idxs)
                if replicated:
                    batch["_replicated"] = True
                with results_cv:
                    results[pos] = batch
                    results_cv.notify_all()

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(min(self.num_workers, len(batches)))
        ]
        for t in threads:
            t.start()
        try:
            for pos in range(len(batches)):
                with results_cv:
                    while pos not in results:
                        results_cv.wait(timeout=60.0)
                    batch = results.pop(pos)
                inflight.release()
                yield batch
        finally:
            stop.set()
            for t in threads:
                t.join(timeout=1.0)
