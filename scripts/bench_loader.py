"""Host data-path throughput bench: GridDataset + threaded DataLoader.

The reference's loader is torch DataLoader (C++ worker pool) + torchvision
transforms; ours is a thread-pool prefetcher (data/loader.py) over native
C fastops (csrc/fastops.c, OpenMP bilinear + row assembly) with PIL/numpy
fallbacks. This script measures what the trainer actually sees:

  python scripts/bench_loader.py                 # items/s, native vs fallback
  python scripts/bench_loader.py --workers 8 --resolution 384

The bar to clear: one v5e train step at the serving sequence is ~300 ms
for micro_bsz 1 (docs/PROFILE.md), i.e. the loader must sustain >~3.3
items/s/host/chip to keep the accelerator fed; the margin printed here is
against that.
"""

from __future__ import annotations

import argparse
import json
import random
import sys
import tempfile
import time
from pathlib import Path

import numpy as np
from PIL import Image

sys.path.insert(0, ".")

STEP_SECONDS = 0.30  # v5e train-step time at micro_bsz 1 (docs/PROFILE.md)


def make_dataset(root: Path, n: int, size: int) -> str:
    records = []
    rng = np.random.default_rng(0)
    for i in range(n):
        img = Image.fromarray(rng.integers(0, 256, (size, size, 3), dtype=np.uint8))
        cond = {}
        for name in ("target", "reference", "foreground", "canny", "depth"):
            p = root / f"{i}_{name}.png"
            img.save(p)
            cond[name] = str(p)
        records.append({
            "condition": cond,
            "quality_assessment": {"objectConsistency": 5},
            "description": {"item": f"item{i}", "description_0": "desc"},
        })
    ann = root / "data.json"
    ann.write_text(json.dumps(records))
    cfg = root / "config.yaml"
    cfg.write_text(f"META:\n- path: {ann}\n  type: image_grid_graph200k\n")
    return str(cfg)


def run_epochs(config: str, resolution: int, workers: int, batch: int,
               n_items: int, epochs: int) -> float:
    from visualcloze_tpu.data import (
        DataLoader,
        Graph200KItemProcessor,
        GridDataset,
        dataloader_collate_fn,
        get_train_sampler,
    )
    from visualcloze_tpu.data.prefix_instruction import graph200k_task_dicts

    dataset = GridDataset(
        config,
        Graph200KItemProcessor(resolution=resolution),
        task_dicts={"image_grid_graph200k": graph200k_task_dicts},
        seed=0,
    )
    steps = (n_items * epochs) // batch
    sampler = get_train_sampler(len(dataset), 0, 1, batch, steps, 0, 0)
    loader = DataLoader(dataset, sampler, batch, dataloader_collate_fn,
                        num_workers=workers)
    it = iter(loader)
    next(it)  # warm caches / thread pool
    t0 = time.perf_counter()
    n = 0
    for _ in range(steps - 1):
        next(it)
        n += batch
    dt = time.perf_counter() - t0
    return n / dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--resolution", type=int, default=384)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--items", type=int, default=24)
    ap.add_argument("--epochs", type=int, default=4)
    args = ap.parse_args()

    random.seed(0)
    import visualcloze_tpu.utils.fastops as fo

    with tempfile.TemporaryDirectory() as td:
        config = make_dataset(Path(td), args.items, args.resolution)

        results = {}
        for label, native in (("native-fastops", True), ("python-fallback", False)):
            if native and not fo.HAVE_NATIVE:
                print(f"{label}: extension not built "
                      f"(python setup.py build_ext --inplace); skipping",
                      file=sys.stderr)
                continue
            prev = fo.HAVE_NATIVE
            fo.HAVE_NATIVE = native
            try:
                ips = run_epochs(config, args.resolution, args.workers,
                                 args.batch, args.items, args.epochs)
            finally:
                fo.HAVE_NATIVE = prev
            results[label] = ips
            print(f"{label}: {ips:.1f} items/s ({args.workers} workers, "
                  f"grid res {args.resolution}) — {ips * STEP_SECONDS:.1f}x the "
                  f"~{1 / STEP_SECONDS:.1f} items/s one chip consumes",
                  file=sys.stderr)
        if "native-fastops" in results and "python-fallback" in results:
            print(f"native speedup: "
                  f"{results['native-fastops'] / results['python-fallback']:.2f}x",
                  file=sys.stderr)
        best = max(results.values()) if results else 0.0
        print(json.dumps({
            "metric": "host data-path throughput (GridDataset+DataLoader)",
            "value": round(best, 1), "unit": "items/s",
            "vs_baseline": round(best * STEP_SECONDS, 2),
        }))


if __name__ == "__main__":
    main()
