"""Graph200K test-set evaluation sweep (counterpart of reference sample.py:49-166).

Iterates test items x context counts {1,2,3} x the evaluation task registry,
builds each grid with the item processor in test mode, masks the target cell,
generates without upsampling, and saves a composite grid + incremental
data.json manifest (resumable by collected ids).
"""

from __future__ import annotations

import argparse
import json
import os
import random

import jax
import numpy as np
from PIL import Image

from visualcloze_tpu.data import Graph200KItemProcessor, check_item_graph200k
from visualcloze_tpu.data.prefix_instruction import (
    PROMPT_BANKS,
    set_prompt_bank,
    test_task_dicts,
)
from visualcloze_tpu.transport.sampling import solver_arg


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", default=None)
    p.add_argument("--model_name", default="flux-dev-fill-lora")
    p.add_argument("--test_json", required=True, help="Graph200K test split data.json")
    p.add_argument("--output_dir", default="./samples")
    p.add_argument("--resolution", type=int, default=384)
    p.add_argument("--lora_rank", type=int, default=256)
    p.add_argument("--guidance", type=float, default=30.0)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--solver", default="euler", type=solver_arg)
    p.add_argument("--prompt_bank", default="reference", choices=list(PROMPT_BANKS),
                   help="prompt template bank; 'reference' (default) draws the "
                        "exact strings the released LoRAs were trained on — "
                        "required for PSNR-vs-reference eval parity")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max_items", type=int, default=0)
    p.add_argument("--demo", action="store_true", help="tiny random model")
    p.add_argument("--shard", type=int, default=0,
                   help="this worker's shard index (items split round-robin)")
    p.add_argument("--num_shards", type=int, default=1,
                   help="total sweep workers — the reference locks sample.py "
                        "to one GPU (ref sample.py:258); here N chips sweep "
                        "disjoint item shards with per-shard manifests")
    return p.parse_args(argv)


def concat_images_grid(rows: list[list[Image.Image]]) -> Image.Image:
    """Compose the full grid into one image for review (ref sample.py:143-149)."""
    widths = [sum(img.width for img in row) for row in rows]
    heights = [max(img.height for img in row) for row in rows]
    canvas = Image.new("RGB", (max(widths), sum(heights)), (255, 255, 255))
    y = 0
    for row, h in zip(rows, heights):
        x = 0
        for img in row:
            canvas.paste(img, (x, y))
            x += img.width
        y += h
    return canvas


def main(argv=None):
    args = parse_args(argv)
    from visualcloze_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    set_prompt_bank(args.prompt_bank)
    random.seed(args.seed)
    np.random.seed(args.seed)

    if args.demo:
        from visualcloze_tpu.pipeline import random_components

        model = random_components(jax.random.PRNGKey(0), tiny=True, resolution=64)
        resolution = 64
    else:
        from visualcloze_tpu.pipeline import build_visualcloze

        model = build_visualcloze(
            model_path=args.model_path, model_name=args.model_name,
            lora_rank=args.lora_rank, resolution=args.resolution, solver=args.solver,
        )
        resolution = args.resolution

    with open(args.test_json) as f:
        items = json.load(f)
    if args.max_items:
        items = items[: args.max_items]

    os.makedirs(args.output_dir, exist_ok=True)
    if args.num_shards > 1:
        assert 0 <= args.shard < args.num_shards
        manifest_path = os.path.join(
            args.output_dir, f"data.{args.shard:02d}-of-{args.num_shards:02d}.json"
        )
    else:
        manifest_path = os.path.join(args.output_dir, "data.json")
    manifest: list[dict] = []
    collected: set[str] = set()
    if os.path.exists(manifest_path):  # resume (ref sample.py:84-92)
        with open(manifest_path) as f:
            manifest = json.load(f)
        collected = {m["id"] for m in manifest}

    processor = Graph200KItemProcessor(resolution=resolution)
    # items passing a row spec, computed once per DISTINCT spec (scanning all
    # N items inside the innermost loop was O(N^2 * tasks) host work)
    pass_cache: dict[tuple, list[int]] = {}

    def passing(row_spec) -> list[int]:
        key = tuple(row_spec)
        if key not in pass_cache:
            pass_cache[key] = [
                k for k, x in enumerate(items) if check_item_graph200k(x, row_spec)
            ]
        return pass_cache[key]

    for item_idx, item in enumerate(items):
        if item_idx % args.num_shards != args.shard:
            continue  # another worker's item (partners still drawn from all)
        for context_num in (1, 2, 3):
            for task in test_task_dicts:
                for row_spec in task["image_list"]:
                    sample_id = f"{item_idx}_{context_num}_{task['task_name']}_{'-'.join(row_spec)}"
                    if sample_id in collected:
                        continue
                    if not check_item_graph200k(item, row_spec):
                        continue
                    partners = [items[k] for k in passing(row_spec) if k != item_idx]
                    if len(partners) < context_num - 1:
                        continue
                    # ALL per-sample randomness (partner choice, generation
                    # seed, template draws) is a pure function of
                    # (--seed, sample_id): the
                    # sweep reproduces identically across resume (the
                    # collected-id skip consumes no draws), sharding layouts,
                    # and reruns — global-stream draws depended on position
                    # in the RNG call sequence
                    srng = random.Random(f"{args.seed}:{sample_id}")
                    gen_seed = srng.randrange(1, 2**31)  # 0 means "random" downstream
                    records = srng.sample(partners, context_num - 1) + [item]
                    _, image_list, prompts, _, (cols, rows_n) = processor.process_item(
                        records, training_mode=False, image_type_list=list(row_spec),
                        context_num=context_num, group_name="image_grid_graph200k",
                        rng=srng,
                    )
                    image_list[-1][-1] = None  # mask the target (ref sample.py:130)
                    model.set_grid_size(rows_n, cols)
                    try:
                        outs = model.process_images(
                            image_list, prompts, seed=gen_seed,
                            cfg=args.guidance, steps=args.steps, is_upsampling=False,
                        )
                    except Exception as e:
                        print(f"[skip] {sample_id}: {e}")
                        continue
                    image_list[-1][-1] = outs[0]
                    grid = concat_images_grid(image_list)
                    out_path = os.path.join(args.output_dir, f"{sample_id}.jpg")
                    grid.save(out_path, quality=92)
                    manifest.append(
                        {"id": sample_id, "image": out_path,
                         "task": task["task_name"], "types": list(row_spec),
                         "context_num": context_num, "prompts": prompts,
                         "seed": gen_seed}
                    )
                    with open(manifest_path, "w") as f:
                        json.dump(manifest, f, indent=1)
                    print(f"[{len(manifest)}] {sample_id}")
    print(f"done: {len(manifest)} samples in {args.output_dir}")


if __name__ == "__main__":
    main()
