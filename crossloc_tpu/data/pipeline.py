"""Host input pipeline: shuffle, batch, background prefetch to device.

Replaces the reference's multiprocess torch DataLoader + collate
(`utils/learning.py:250-252`): a thread pool decodes/loads items while the
accelerator computes, and all augmentation runs on device (data/augment.py),
so the host only moves raw bytes.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import numpy as np


def images_to_wire(batch: dict) -> dict:
    """Re-pack decoded [0, 1] float32 images as uint8 for the host->device
    link: 4x fewer bytes per batch. On a tunnel/PCIe-bandwidth-bound host
    the image transfer IS the training critical path (measured ~10 MB/s
    through the axon tunnel: a 50 MB float32 B=12 batch at 480x720 costs
    ~5 s/step while the step computes in 0.1-0.3 s — BENCH_NOTES round 5).

    Precision: pixels on the k/255 grid round-trip bit-exactly — `rint(x *
    255)` recovers k and the device-side `augment.images_from_wire`
    (`uint8 -> f32 / 255.0`) reproduces the host's division rounding. The
    PIL decode/resize path is always on-grid (PIL's BILINEAR resize itself
    emits uint8, as does the reference's torchvision pipeline); the native
    C++ loader resizes in float32, and for it the packing applies the SAME
    uint8 quantization PIL/the reference would (<= 1/510 per pixel).
    Off-grid synthetic tensors fed straight to the library API never pass
    through here — only the CLIs pack."""
    img = batch.get("image")
    if img is None or img.dtype != np.float32:
        return batch
    out = dict(batch)
    out["image"] = np.rint(img * 255.0).astype(np.uint8)
    return out


def device_prefetch(iterator, size: int = 2, keys=("image", "pose", "focal")):
    """Overlap host->device transfer with device compute: keep `size`
    batches' arrays already on device (jax.device_put is async)."""
    import collections

    import jax

    buf = collections.deque()

    def put(batch):
        out = dict(batch)
        for k in keys:
            if k in out and isinstance(out[k], np.ndarray):
                out[k] = jax.device_put(out[k])
        return out

    for batch in iterator:
        buf.append(put(batch))
        if len(buf) >= size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


class Loader:
    """Iterates (epoch-wise) over host batches with background prefetch."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 2021,
        num_workers: int = 4,
        prefetch: int = 2,
        drop_last: bool = True,
        shard: tuple = (0, 1),
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        # Epoch-keyed shuffling (standard distributed-sampler pattern): the
        # order of epoch E is a pure function of (seed, E), so a resumed run
        # sees the same data order as an uninterrupted one (exact-resume
        # contract of the `.state` checkpoints) and all multi-host ranks
        # agree without coordination. set_epoch(E) before iterating; __iter__
        # auto-increments otherwise.
        self._epoch = 0
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.drop_last = drop_last
        # Multi-host feeding: (process_index, process_count). Every process
        # shuffles the FULL index list with the same seed, then reads the
        # interleaved slice idx[rank::world] — disjoint coverage without
        # coordination (see parallel.distributed.global_batch_from_local).
        rank, world = shard
        if not (0 <= rank < world):
            raise ValueError(f"shard rank {rank} not in [0, {world})")
        self.shard = (rank, world)

    def _local_size(self) -> int:
        # The MINIMUM shard size across ranks, not this rank's own size:
        # interleaved shards differ by one element, and if ranks straddling a
        # batch_size boundary disagreed on batches-per-epoch, a real
        # multi-host run would deadlock in the first per-step collective of
        # the rank that ran out of batches. All ranks therefore agree on
        # len(dataset) // world and the longer shards drop their extra item.
        _, world = self.shard
        return len(self.dataset) // world

    def __len__(self) -> int:
        n = self._local_size()
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def set_epoch(self, epoch: int) -> None:
        self._epoch = int(epoch)

    def _index_batches(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng([self.seed, self._epoch]).shuffle(idx)
        rank, world = self.shard
        # truncate to the minimum shard size so every rank sees the SAME
        # element count — with drop_last=False the final batch would
        # otherwise differ in size across ranks (len(dataset)=10, world=3,
        # bs=2: rank 0's batch 1 has 2 items, ranks 1-2 get 1), breaking
        # make_array_from_process_local_data / deadlocking collectives
        idx = idx[rank::world][: self._local_size()]
        nb = len(self)
        for b in range(nb):
            yield idx[b * self.batch_size : (b + 1) * self.batch_size]

    def __iter__(self) -> Iterator[dict]:
        batches = list(self._index_batches())
        self._epoch += 1  # next epoch reshuffles (callers may set_epoch)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            with ThreadPoolExecutor(self.num_workers) as pool:
                futures = [pool.submit(self.dataset.collate, b) for b in batches]
                for f in futures:
                    if stop.is_set():
                        f.cancel()
                        continue
                    try:
                        q.put(f.result())
                    except Exception as e:  # surface loader errors to the consumer
                        q.put(e)
                        break
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
