"""Host input-pipeline microbench (VERDICT r4 weak #2).

Measures what the training/eval loops actually demand from the host:
  1. native C++ decode+resize (`native/loader.cpp`) per 480x720 image,
     at 1/2/4 threads (the decoder drops the GIL, so threads scale until
     the cores run out);
  2. the PIL fallback path, for the no-toolchain case;
  3. full `CamLocDataset.collate` cost per image (decode + label tensor
     load + pose/calibration parse);
  4. Loader end-to-end overlap: feeding a simulated consumer, how much of
     the collate cost the prefetch queue actually hides.

Prints a human table and ONE final JSON line. Extrapolates how many host
cores sustain the B=12 train feed (~100 img/s at the measured step wall)
and the fused-eval feed (~500 img/s) — the reference sizes its DataLoader
workers for the same reason (`utils/learning.py:251`).

Usage: python tools/loader_bench.py [n_frames=24] [repeat=3]
(CPU-only; runs anywhere, no TPU needed.)
"""
import json
import os
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench_threads(fn, paths, n_threads, repeat):
    """Best-of-`repeat` wall time to run fn over all paths with a pool."""
    best = float("inf")
    for _ in range(repeat):
        t0 = time.perf_counter()
        if n_threads == 1:
            for p in paths:
                fn(p)
        else:
            with ThreadPoolExecutor(n_threads) as pool:
                list(pool.map(fn, paths))
        best = min(best, time.perf_counter() - t0)
    return len(paths) / best  # img/s


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    repeat = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from crossloc_tpu import data, native
    from crossloc_tpu.data.dataset import _load_image, _load_image_resized, _resize_height

    ncpu = os.cpu_count() or 1
    print(f"host cores: {ncpu}; frames: {n} at 480x720; repeat: {repeat}")

    with tempfile.TemporaryDirectory() as tmp:
        root = os.path.join(tmp, "train_sim")
        data.write_fake_dataset(root, n=n, img_h=480, img_w=720, focal=480.0, seed=0)
        paths = [os.path.join(root, "rgb", f) for f in sorted(os.listdir(os.path.join(root, "rgb")))]

        out = {"metric": "loader_bench", "unit": "img/s", "cores": ncpu}

        # 1. native decode+resize
        if native.available():
            for nt in (1, 2, 4):
                rate = bench_threads(lambda p: _load_image_resized(p, 480), paths, nt, repeat)
                out[f"native_t{nt}"] = round(rate, 1)
                print(f"native decode+resize, {nt} thread(s): {rate:8.1f} img/s")
        else:
            print("native decoder unavailable (toolchain missing) — skipping")

        # 2. PIL fallback
        rate = bench_threads(lambda p: _resize_height(_load_image(p), 480), paths, 1, repeat)
        out["pil_t1"] = round(rate, 1)
        print(f"PIL decode+resize,    1 thread  : {rate:8.1f} img/s")

        # 3. full collate (decode + init coord tensor + pose + calibration)
        ds = data.CamLocDataset(root, mode=1, image_height=480)
        idx = list(range(min(n, len(ds))))
        best = float("inf")
        for _ in range(repeat):
            t0 = time.perf_counter()
            ds.collate(idx)
            best = min(best, time.perf_counter() - t0)
        collate_rate = len(idx) / best
        out["collate_t4"] = round(collate_rate, 1)  # collate uses its callers' pool;
        # here it runs inline — per-image cost is what matters
        print(f"full collate (mode 1, inline)  : {collate_rate:8.1f} img/s")

        # 4. Loader overlap: batches of 12 through the prefetch queue while a
        # consumer "computes" for step_s per batch; measure consumer-visible
        # stall (time waiting on the queue beyond its own compute)
        from crossloc_tpu.data.pipeline import Loader

        for step_ms in (120.0, 60.0):
            loader = Loader(ds, batch_size=12, shuffle=False, num_workers=min(4, ncpu), prefetch=2)
            nb = len(loader)
            t0 = time.perf_counter()
            for _ in loader:
                time.sleep(step_ms / 1e3)
            wall = time.perf_counter() - t0
            stall = wall - nb * step_ms / 1e3
            key = f"overlap_stall_ms_at_{int(step_ms)}ms_step"
            out[key] = round(stall / max(nb, 1) * 1e3, 1)
            print(f"Loader overlap, {step_ms:5.0f} ms/step x {nb} batches: "
                  f"wall {wall:6.2f} s, stall {stall / max(nb, 1) * 1e3:6.1f} ms/batch")

        # extrapolation: cores needed for the two production feed rates
        per_core = out.get("native_t1", out["pil_t1"])
        collate_overhead = max(per_core / max(collate_rate, 1e-9), 1.0)
        eff = per_core / collate_overhead  # img/s/core incl. label load
        out["imgs_per_core"] = round(eff, 1)
        out["cores_for_train_100"] = round(100.0 / eff, 2)
        out["cores_for_eval_500"] = round(500.0 / eff, 2)
        print(f"\nper-core sustained feed (decode+labels): {eff:.1f} img/s/core")
        print(f"cores for B=12 train feed (100 img/s): {out['cores_for_train_100']}")
        print(f"cores for fused-eval feed (500 img/s): {out['cores_for_eval_500']}")

        print(json.dumps(out))


if __name__ == "__main__":
    main()
