"""Graph200K preprocessing: HF dataset -> on-disk image tree + data.json.

Counterpart of the reference processing.py:16-96: materializes every
condition image of the VisualCloze/Graph200K dataset to disk and writes the
annotation records the trainer/sampler consume
(data/data_reader.Graph200KItemProcessor, data/data_utils.check_item_graph200k).

Key mapping follows the HF dataset's actual column names (reference
processing.py:8-77 and docs/DATASET.md): `ref` becomes the record's
`reference`, `qwen_2_5_mask` becomes `mask` (plus `qwen_2_5_meta`),
`qwen_2_5_bounding_box` becomes `bbox`, the style families pair
`{fam}_image_{i}` with `{fam}_ref_{i}`, and FillEdit carries its meta
name/description alongside the 5 edited images.
"""

from __future__ import annotations

import argparse
import json
import os


# HF column -> record key, saved verbatim as one image each.
DIRECT_KEYS = {
    "target": "target",
    "ref": "reference",
    "canny": "canny",
    "depth": "depth",
    "hed": "hed",
    "normal": "normal",
    "mlsd": "mlsd",
    "openpose": "openpose",
    "sam2_mask": "sam2_mask",
    "uniformer": "uniformer",
    "foreground": "foreground",
    "DepthEdit": "DepthEdit",
    # Qwen-2.5-VL + SAM2 annotations (ref processing.py:40-45)
    "qwen_2_5_mask": "mask",
    "qwen_2_5_bounding_box": "bbox",
}
STYLE_KEYS = {"InstantStyle": 3, "ReduxStyle": 3}  # {fam}_image_i / {fam}_ref_i
FILLEDIT_COUNT = 5  # FillEdit_image_{0..4} + FillEdit_meta (ref :51-61)


def _save(img, path: str) -> str:
    img.convert("RGB").save(path, quality=95)
    return path


def process_split(dataset, output_dir: str, split: str) -> None:
    image_root = os.path.join(output_dir, split)
    os.makedirs(image_root, exist_ok=True)
    records = []
    for idx, item in enumerate(dataset):
        condition: dict = {}
        item_dir = os.path.join(image_root, f"{idx:08d}")
        os.makedirs(item_dir, exist_ok=True)

        for col, key in DIRECT_KEYS.items():
            img = item.get(col)
            if img is None:
                continue
            condition[key] = _save(img, os.path.join(item_dir, f"{key}.jpg"))
        if "mask" in condition or "bbox" in condition:
            condition["qwen_2_5_meta"] = item.get("qwen_2_5_meta")

        # style families: keep the pair lists only when the full set exists,
        # like the reference (partial sets would skew the style-pick rng)
        for fam, count in STYLE_KEYS.items():
            images = [item.get(f"{fam}_image_{i}") for i in range(count)]
            styles = [item.get(f"{fam}_ref_{i}") for i in range(count)]
            if all(im is not None for im in images + styles):
                condition[fam] = {
                    "image_path": [
                        _save(im, os.path.join(item_dir, f"{fam}_image_{i}.jpg"))
                        for i, im in enumerate(images)
                    ],
                    "style_path": [
                        _save(st, os.path.join(item_dir, f"{fam}_ref_{i}.jpg"))
                        for i, st in enumerate(styles)
                    ],
                }

        images = [item.get(f"FillEdit_image_{i}") for i in range(FILLEDIT_COUNT)]
        if all(im is not None for im in images):
            meta = item.get("FillEdit_meta") or {}
            condition["FillEdit"] = {
                "image_path": [
                    _save(im, os.path.join(item_dir, f"FillEdit_image_{i}.jpg"))
                    for i, im in enumerate(images)
                ],
                "name": meta.get("name"),
                "description": meta.get("description"),
            }

        records.append(
            {
                "condition": condition,
                "quality_assessment": item.get("quality_assessment"),
                "description": item.get("description")
                or {"item": item.get("item", ""), "description_0": item.get("description_0", "")},
                "collection": item.get("collection"),
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
