"""Host-side input pipeline: recursive file scan, threaded decode + letterbox,
prefetched device batches.

Replaces the reference's torch DataLoader pipeline (datasets/dataset.py):
- `LowLightDataset` / `LowLightTestDataset` mirror the reference classes
  (:21-183, :186-258): recursive scan for jpg/jpeg/png/bmp, PIL decode to RGB,
  letterbox, [0,1] floats; unsupervised so no labels.
- `get_train_loader` replaces get_train_dataloader (:261-300): a thread-pool
  decode stage feeding fixed-shape uint8 batches; augmentation runs on device
  (see data/augment.py) instead of in worker processes.

NOTE(PARITY.md): the reference letterboxes training crops with auto=True
(multiple-of-32 minimal padding, datasets/dataset.py:92-99), which yields
ragged shapes for mixed-aspect datasets and only collates because typical
datasets are uniform; we pad to the full square canvas (auto=False) so any
dataset batches, and jit sees one static shape.
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from retinex_tpu.ops.letterbox import letterbox_np, plan_letterbox

VALID_EXTENSIONS = {".jpg", ".jpeg", ".png", ".bmp"}
VALID_EXTENSIONS_ENHANCE = VALID_EXTENSIONS | {".tif", ".tiff"}


def list_image_files(image_dir: str, recursive: bool = True, extensions=VALID_EXTENSIONS) -> list[str]:
    """Sorted recursive scan (reference: datasets/dataset.py:61-74)."""
    files = []
    if recursive:
        for root, _dirs, names in os.walk(image_dir):
            for name in names:
                if os.path.splitext(name)[1].lower() in extensions:
                    files.append(os.path.join(root, name))
    else:
        for name in os.listdir(image_dir):
            if os.path.splitext(name)[1].lower() in extensions:
                files.append(os.path.join(image_dir, name))
    return sorted(files)


def decode_image(path: str) -> np.ndarray:
    """Decode to RGB uint8 HWC via PIL (reference: datasets/dataset.py:87)."""
    from PIL import Image

    with Image.open(path) as img:
        return np.asarray(img.convert("RGB"))


class LowLightDataset:
    """Training dataset: decode + letterbox to a square image_size canvas.

    Augmentation happens on device (data/augment.py), so __getitem__ returns
    the deterministic letterboxed uint8 image.
    """

    def __init__(self, image_dir: str, image_size: int = 640):
        self.image_dir = image_dir
        self.image_size = image_size
        self.image_files = list_image_files(image_dir)
        if not self.image_files:
            raise ValueError(f"No images found in {image_dir}")

    def __len__(self) -> int:
        return len(self.image_files)

    def __getitem__(self, idx: int) -> np.ndarray:
        img = decode_image(self.image_files[idx])
        plan = plan_letterbox(
            img.shape[0], img.shape[1], self.image_size, auto=False, scaleup=True
        )
        return letterbox_np(img, plan)


class LowLightTestDataset:
    """Test dataset: full-resolution (or max_size-capped) letterbox, no
    augmentation; yields (image, filename) like the reference (:186-258)."""

    def __init__(self, image_dir: str, max_size: int | None = None):
        self.image_dir = image_dir
        self.max_size = max_size
        self.image_files = list_image_files(image_dir)
        if not self.image_files:
            raise ValueError(f"No images found in {image_dir}")

    def __len__(self) -> int:
        return len(self.image_files)

    def __getitem__(self, idx: int):
        img = decode_image(self.image_files[idx])
        h, w = img.shape[:2]
        if self.max_size is not None:
            plan = plan_letterbox(h, w, self.max_size, auto=True, scaleup=False)
        else:
            plan = plan_letterbox(h, w, (h, w), auto=True, scaleup=False)
        return letterbox_np(img, plan), os.path.basename(self.image_files[idx])


class _PrefetchIterator:
    """Threaded batch producer: decodes + letterboxes via the native C++
    pipeline when available (no GIL, libjpeg-turbo SIMD — see
    data/native_loader.py), else a Python thread pool; keeps `prefetch`
    batches in flight."""

    def __init__(self, dataset, order, batch_size, drop_last, num_workers, prefetch=2):
        self.dataset = dataset
        self.order = order
        self.batch_size = batch_size
        self.drop_last = drop_last
        self.num_workers = max(num_workers, 1)
        try:
            from retinex_tpu.data.native_loader import native_available

            self.use_native = isinstance(dataset, LowLightDataset) and native_available()
        except Exception:
            self.use_native = False
        self.pool = None if self.use_native else ThreadPoolExecutor(max_workers=self.num_workers)
        self.q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self.thread = threading.Thread(target=self._produce, daemon=True)
        self.thread.start()

    def _put(self, item) -> bool:
        """Bounded put that aborts when the consumer closed the iterator —
        a plain q.put would block forever if the consumer broke out early."""
        while not self._stop.is_set():
            try:
                self.q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _produce(self):
        n = len(self.order)
        for start in range(0, n, self.batch_size):
            if self._stop.is_set():
                break
            idxs = self.order[start : start + self.batch_size]
            if len(idxs) < self.batch_size and self.drop_last:
                break
            if self.use_native:
                from retinex_tpu.data.native_loader import decode_letterbox_batch

                paths = [self.dataset.image_files[i] for i in idxs]
                batch = decode_letterbox_batch(
                    paths,
                    self.dataset.image_size,
                    auto_pad=False,
                    scaleup=True,
                    num_threads=self.num_workers,
                )
            else:
                imgs = list(self.pool.map(self.dataset.__getitem__, idxs))
                batch = np.stack(imgs, axis=0)
            if not self._put(batch):
                break
        self._put(None)
        if self.pool is not None:
            self.pool.shutdown(wait=False)

    def close(self):
        """Stop the producer thread and drain the queue. Safe to call even
        after exhaustion; consumers that break out of the epoch early MUST
        call this (or use the context manager) or the producer blocks on the
        bounded queue forever, leaking a thread + decoded batches."""
        self._stop.set()
        while True:
            try:
                self.q.get_nowait()
            except queue.Empty:
                break
        self.thread.join(timeout=5.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __iter__(self):
        return self

    def __next__(self):
        batch = self.q.get()
        if batch is None:
            raise StopIteration
        return batch


class TrainLoader:
    """Epoch-shuffled batch loader yielding uint8 NHWC numpy batches."""

    def __init__(
        self,
        dataset: LowLightDataset,
        batch_size: int = 8,
        shuffle: bool = True,
        drop_last: bool = False,
        num_workers: int = 4,
        seed: int = 0,
        shard: tuple[int, int] = (0, 1),
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        # Multi-host: (process_index, process_count). Every process shuffles
        # with the SAME seed, takes a disjoint stride slice, and truncates to
        # a common length so all processes run identical step counts (a
        # mismatched step count deadlocks the gradient collectives).
        self.shard = shard
        self._rng = np.random.default_rng(seed)

    def _shard_len(self) -> int:
        _, count = self.shard
        return len(self.dataset) // count if count > 1 else len(self.dataset)

    def __len__(self) -> int:
        n = self._shard_len()
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(order)
        index, count = self.shard
        if count > 1:
            order = order[index::count][: self._shard_len()]
        return _PrefetchIterator(
            self.dataset, list(order), self.batch_size, self.drop_last, self.num_workers
        )


class TestLoader:
    """Sequential (image, name) iterator over a test directory — the analog of
    get_test_dataloader (reference: datasets/dataset.py:303-332). Batch size is
    1 because test images keep their own letterboxed shapes."""

    def __init__(self, dataset: "LowLightTestDataset", num_workers: int = 2):
        self.dataset = dataset
        self.num_workers = num_workers

    def __len__(self) -> int:
        return len(self.dataset)

    def __iter__(self):
        for i in range(len(self.dataset)):
            img, name = self.dataset[i]
            yield img[None], name


def get_test_loader(image_dir: str, max_size: int | None = None, num_workers: int = 2) -> TestLoader:
    """Mirror of get_test_dataloader (reference: datasets/dataset.py:303-332)."""
    return TestLoader(LowLightTestDataset(image_dir, max_size), num_workers)


def get_train_loader(
    image_dir: str,
    batch_size: int = 8,
    image_size: int = 640,
    num_workers: int = 4,
    shuffle: bool = True,
    drop_last: bool = False,
    seed: int = 0,
    shard: tuple[int, int] = (0, 1),
) -> TrainLoader:
    """Mirror of get_train_dataloader (reference: datasets/dataset.py:261-300).
    `shard=(process_index, process_count)` for multi-host training."""
    return TrainLoader(
        LowLightDataset(image_dir, image_size),
        batch_size=batch_size,
        shuffle=shuffle,
        drop_last=drop_last,
        num_workers=num_workers,
        seed=seed,
        shard=shard,
    )
