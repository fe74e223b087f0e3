"""Metrics and example-gallery machinery tests."""

import pytest
import numpy as np

from visualcloze_tpu.utils.metrics import mae, psnr, ssim


def test_psnr_identity_and_noise():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (32, 32, 3)).astype(np.float64)
    assert psnr(img, img) == float("inf")
    noisy = img + rng.normal(0, 2.0, img.shape)
    p = psnr(img, noisy)
    assert 35 < p < 50
    # psnr formula check: sigma=2 -> ~10*log10(255^2/4) = 42.1
    assert abs(p - 10 * np.log10(255 ** 2 / np.mean((img - noisy) ** 2))) < 1e-9


def test_ssim_mae_basics():
    a = np.full((16, 16), 100.0)
    assert ssim(a, a) == 1.0
    assert mae(a, a + 3) == 3.0


def test_examples_registry():
    from examples import TaskExample, generate_paths_from_id, process_tasks, task_families

    paths = generate_paths_from_id("abc", "a cat")
    assert paths["canny"].endswith("abc_canny.jpg")
    assert paths["prompt"] == "a cat"
    # get() is existence-checked: fabricated ids resolve to the default
    assert paths.get("canny") is None and paths.get("canny", "fb") == "fb"
    assert isinstance(task_families, dict)
    ex = TaskExample(
        name="canny to image", image_type_list=["canny", "target"],
        file_ids=["dense_0", "dense_1"], prompts=["p0", "p1"],  # committed pack
    )
    out = process_tasks(ex, context_num=1)
    mask_count, grid_h, grid_w = out[0], out[1], out[2]
    assert (mask_count, grid_h, grid_w) == (1, 2, 2)
    assert len(out) == 8 + grid_h * grid_w
    grid = ex.rows(context_num=1)
    assert grid[-1][-1] is None and grid[0][0] is not None

    # an example whose assets don't exist must not surface in a family
    from examples import register_task_family

    register_task_family("__missing__", [TaskExample(
        name="ghost", image_type_list=["canny", "target"],
        file_ids=["nope_0", "nope_1"], prompts=["p", "p"])])
    assert task_families["__missing__"] == []


def test_all_16_gallery_families_have_assets():
    """The demo ships 16 non-empty task-family galleries (ref app.py:163-276);
    every example's grid paths exist and apply_example_outputs fills the UI."""
    import os

    import app

    entries = app.gallery_entries()
    assert len(entries) == 16, sorted(entries)
    for family, items in entries.items():
        # curated bank breadth: >=4 rows per family with family-specific
        # content phrasing (ref examples/gradio_tasks_relighting.py:9-107 style)
        assert len(items) >= 4, (family, len(items))
        contents = {ex.prompts[-1] for _, ex in items}
        assert len(contents) >= 4, (family, contents)
        for thumb, ex in items:
            assert os.path.exists(thumb), (family, thumb)
            grid = ex.rows(context_num=1)
            for row in grid:
                for cell in row:
                    assert cell is None or os.path.exists(cell), (family, cell)
    out = app.apply_example_outputs(entries["dense_prediction"][0][1])
    gh, gw = out[0], out[1]
    assert gh >= 2 and gw >= 2
    assert len(out) == 7 + 25


def test_sample_cli_demo_sweep(tmp_path):
    """sample.py eval sweep end to end on a tiny model + synthetic test set."""
    import json
    import random

    import numpy as np
    from PIL import Image

    import sample as sample_cli

    random.seed(0)
    items = []
    for i in range(2):
        img = Image.fromarray(
            np.random.default_rng(i).integers(0, 256, (64, 64, 3), dtype=np.uint8)
        )
        cond = {}
        for name in ("target", "reference", "foreground", "canny", "depth",
                     "openpose", "uniformer"):
            p = tmp_path / f"{i}_{name}.png"
            img.save(p)
            cond[name] = str(p)
        items.append({
            "condition": cond,
            "quality_assessment": {"objectConsistency": 5},
            "description": {"item": f"i{i}", "description_0": "d"},
        })
    test_json = tmp_path / "test.json"
    test_json.write_text(json.dumps(items))
    out_dir = tmp_path / "out"
    sample_cli.main([
        "--test_json", str(test_json),
        "--output_dir", str(out_dir),
        "--demo", "--steps", "2", "--max_items", "1",
    ])
    manifest = json.loads((out_dir / "data.json").read_text())
    assert len(manifest) >= 3
    assert all((tmp_path / "out" / f"{m['id']}.jpg").exists() for m in manifest[:3])


def test_inference_cli_demo(tmp_path):
    import inference as inference_cli

    out = tmp_path / "demo.jpg"
    inference_cli.main(["--demo", "--steps", "2", "--no_upsampling", "-o", str(out)])
    assert out.exists()


@pytest.mark.slow
def test_inference_cli_demo_tp_sharded(tmp_path):
    """--tp/--fsdp shard the DiT over a serving mesh from the CLI (the
    multi-chip 12B serving route; the reference serves single-GPU only)."""
    import inference as inference_cli

    out = tmp_path / "demo_tp.jpg"
    inference_cli.main([
        "--demo", "--steps", "2", "--no_upsampling",
        "--tp", "2", "--fsdp", "2", "-o", str(out),
    ])
    assert out.exists()


@pytest.mark.slow
def test_sample_cli_sharded_sweep_disjoint(tmp_path):
    """--shard/--num_shards split items disjointly with per-shard manifests
    (the reference locks sample.py to one GPU; ref sample.py:258)."""
    import json
    import random

    import numpy as np
    from PIL import Image

    import sample as sample_cli

    random.seed(0)
    items = []
    for i in range(2):
        img = Image.fromarray(
            np.random.default_rng(i).integers(0, 256, (64, 64, 3), dtype=np.uint8)
        )
        cond = {}
        for name in ("target", "reference", "foreground", "canny", "depth",
                     "openpose", "uniformer"):
            p = tmp_path / f"{i}_{name}.png"
            img.save(p)
            cond[name] = str(p)
        items.append({
            "condition": cond,
            "quality_assessment": {"objectConsistency": 5},
            "description": {"item": f"i{i}", "description_0": "d"},
        })
    test_json = tmp_path / "test.json"
    test_json.write_text(json.dumps(items))
    out_dir = tmp_path / "out"
    ids = {}
    for shard in (0, 1):
        random.seed(0)
        sample_cli.main([
            "--test_json", str(test_json),
            "--output_dir", str(out_dir),
            "--demo", "--steps", "2",
            "--shard", str(shard), "--num_shards", "2",
        ])
        manifest = json.loads((out_dir / f"data.{shard:02d}-of-02.json").read_text())
        assert manifest, f"shard {shard} produced nothing"
        ids[shard] = {m["id"] for m in manifest}
    assert not (ids[0] & ids[1])  # disjoint work
    # shard prefix of each id is the item index: round-robin split
    assert all(i.startswith("0_") for i in ids[0])
    assert all(i.startswith("1_") for i in ids[1])


@pytest.mark.slow
def test_inference_cli_demo_cp_ring_attention(tmp_path):
    """--cp shards the denoise attention over a ring (sequence parallelism
    for long grids) from the serving CLI."""
    import inference as inference_cli

    out = tmp_path / "demo_cp.jpg"
    inference_cli.main([
        "--demo", "--steps", "2", "--no_upsampling",
        "--cp", "2", "--fsdp", "2", "-o", str(out),
    ])
    assert out.exists()
