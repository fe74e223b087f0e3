"""Graph200K preprocessing: HF dataset -> on-disk image tree + data.json.

Counterpart of the reference processing.py:16-96: materializes every
condition image of the VisualCloze/Graph200K dataset to disk and writes the
annotation records the trainer/sampler consume.
"""

from __future__ import annotations

import argparse
import json
import os


CONDITION_KEYS = [
    "target", "reference", "canny", "depth", "hed", "normal", "mlsd",
    "openpose", "sam2_mask", "uniformer", "foreground", "mask",
]
MULTI_KEYS = {"InstantStyle": 3, "ReduxStyle": 3, "FillEdit": 5}
SINGLE_EXTRA = ["DepthEdit"]


def process_split(dataset, output_dir: str, split: str) -> None:
    image_root = os.path.join(output_dir, split)
    os.makedirs(image_root, exist_ok=True)
    records = []
    for idx, item in enumerate(dataset):
        condition: dict = {}
        item_dir = os.path.join(image_root, f"{idx:08d}")
        os.makedirs(item_dir, exist_ok=True)
        for key in CONDITION_KEYS + SINGLE_EXTRA:
            img = item.get(key)
            if img is None:
                continue
            path = os.path.join(item_dir, f"{key}.jpg")
            img.convert("RGB").save(path, quality=95)
            condition[key] = path
        for key, count in MULTI_KEYS.items():
            style_paths, image_paths = [], []
            for i in range(count):
                s = item.get(f"{key.lower()}_style_{i}") or item.get(f"{key}_style_{i}")
                m = item.get(f"{key.lower()}_image_{i}") or item.get(f"{key}_image_{i}")
                if s is None or m is None:
                    continue
                sp = os.path.join(item_dir, f"{key}_style_{i}.jpg")
                mp = os.path.join(item_dir, f"{key}_image_{i}.jpg")
                s.convert("RGB").save(sp, quality=95)
                m.convert("RGB").save(mp, quality=95)
                style_paths.append(sp)
                image_paths.append(mp)
            if style_paths:
                condition[key] = {"style_path": style_paths, "image_path": image_paths}
        records.append(
            {
                "condition": condition,
                "quality_assessment": item.get("quality_assessment"),
                "description": item.get("description")
                or {"item": item.get("item", ""), "description_0": item.get("description_0", "")},
            }
        )
    with open(os.path.join(output_dir, f"{split}_data.json"), "w") as f:
        json.dump(records, f)
    print(f"{split}: {len(records)} records -> {output_dir}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="VisualCloze/Graph200K")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--splits", nargs="+", default=["train", "test"])
    args = p.parse_args()

    from datasets import load_dataset

    for split in args.splits:
        ds = load_dataset(args.dataset, split=split)
        process_split(ds, args.output_dir, split)


if __name__ == "__main__":
    main()
