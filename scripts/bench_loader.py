#!/usr/bin/env python
"""Host input-pipeline throughput: aug-crops/s through the canonical IDT
training pipeline (VERDICT r3 item 4).

The train bench measures the device step on a pre-staged batch; the REAL
loop must feed it through `PrefetchLoader` (threaded np.load + RandCrop3D +
scipy rotate + intensity + flip, data/loader.py + data/transforms.py). This
script measures that host path in isolation on real-size volumes — the
reference machinery being replaced is `MultiEpochsDataLoader` with 8 worker
processes (reference utils/lr_scheduler.py:91-109, train.py:122-128).

Prints ONE JSON line: aug-crops/s, per-stage breakdown (load / crop+aug),
and the verdict against the measured device train rate (BENCH_r03:
4.30 steps/s at batch 1 -> the loader must sustain ~4.3 crops/s/core-pool
to keep the chip busy).

Usage: python scripts/bench_loader.py [--cases 8] [--iters 40]
       [--threads 8] [--shape 160 192 146]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=int, default=8)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--batch_size", type=int, default=1)
    # typical post-crop BraTS extents (sup_128 guarantees >=128/axis,
    # reference preprocess_brats.py:15-24; full grid is 240x240x155)
    ap.add_argument("--shape", type=int, nargs=3, default=(160, 192, 146))
    args = ap.parse_args()

    from passion_tpu.config import TRAIN_TRANSFORMS
    from passion_tpu.data.datasets import BratsTrainIDT
    from passion_tpu.data.loader import PrefetchLoader
    from passion_tpu.data.synth import make_synthetic_dataset

    with tempfile.TemporaryDirectory() as root:
        make_synthetic_dataset(root, n_cases=args.cases,
                               shape=tuple(args.shape), seed=0)
        import os
        ds = BratsTrainIDT(transforms=TRAIN_TRANSFORMS, root=root,
                           mask_type="idt",
                           train_file=os.path.join(root, "imb_split.csv"))
        loader = PrefetchLoader(ds, batch_size=args.batch_size, shuffle=True,
                                num_threads=args.threads, prefetch=2)

        # stage timings (single-threaded probes, after page-cache warm)
        rng = np.random.default_rng(0)
        _ = ds.get(0, rng)  # warm the page cache for case 0
        t0 = time.perf_counter()
        raw = np.load(ds.volpaths[0])
        t_load = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = ds.get(0, np.random.default_rng(1))
        t_item = time.perf_counter() - t0
        del raw

        # end-to-end: consume batches through the prefetching loader
        n_items = 0
        it = iter(loader)
        next(it)  # warmup batch (thread pool spin-up + cold page cache)
        t0 = time.perf_counter()
        done = 0
        while done < args.iters:
            try:
                b = next(it)
            except StopIteration:
                it = iter(loader)
                continue
            n_items += b["x"].shape[0]
            done += 1
        dt = time.perf_counter() - t0
        it.close()  # release the producer thread before the tmpdir goes

        crops_per_s = n_items / dt
        target = 4.30  # measured device steps/s at batch 1 (BENCH_r03.json)
        print(json.dumps({
            "metric": "loader_throughput",
            "aug_crops_per_sec": round(crops_per_s, 3),
            "unit": "aug-crops/sec (idt pipeline, RandCrop3D 80^3 + "
                    "RandomRotion + intensity + flip)",
            "volume_shape": list(args.shape),
            "threads": args.threads,
            "host_cores": os.cpu_count(),
            "stage_full_np_load_s": round(t_load, 4),
            "stage_one_item_s": round(t_item, 4),
            "device_train_steps_per_sec": target,
            "keeps_device_busy": crops_per_s >= target,
        }))


if __name__ == "__main__":
    main()
