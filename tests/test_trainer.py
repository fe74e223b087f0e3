"""Trainer integration: full CLI smoke run on a synthetic dataset (tiny model,
CPU), checkpoint save/resume, reference-format LoRA export roundtrip."""

import json
import random

import jax
import numpy as np
import pytest
from PIL import Image

from visualcloze_tpu.config import FluxConfig
from visualcloze_tpu.models.flux import init_flux
from visualcloze_tpu.models.lora import init_lora
from visualcloze_tpu.training import checkpoint as ckpt
from visualcloze_tpu.training import init_train_state, make_optimizer
from visualcloze_tpu.training.batch import sample_random_mask, to_micro_batches



def make_dataset_files(tmp_path, n=6, size=64):
    records = []
    for i in range(n):
        img = Image.fromarray(
            np.random.default_rng(i).integers(0, 256, (size, size, 3), dtype=np.uint8)
        )
        cond = {}
        for name in ("target", "reference", "foreground", "canny", "depth"):
            p = tmp_path / f"{i}_{name}.png"
            img.save(p)
            cond[name] = str(p)
        records.append(
            {
                "condition": cond,
                "quality_assessment": {"objectConsistency": 5},
                "description": {"item": f"item{i}", "description_0": "desc"},
            }
        )
    ann = tmp_path / "data.json"
    ann.write_text(json.dumps(records))
    config = tmp_path / "config.yaml"
    config.write_text(f"META:\n- path: {ann}\n  type: image_grid_graph200k\n")
    return str(config)


def test_sample_random_mask_semantics():
    rng = np.random.default_rng(0)
    m = sample_random_mask(32, 96, w_grid=3, context=True, rng=rng)
    assert m.sum() == 0
    masked_cols = []
    for _ in range(20):
        m = sample_random_mask(32, 96, w_grid=3, context=False, rng=rng)
        assert m.sum() == 32 * 32  # exactly one cell
        masked_cols.append(int(m.sum(axis=0).argmax()) // 32)
    assert len(set(masked_cols)) > 1  # random cell choice happens


def test_to_micro_batches():
    batch = {"x1": np.zeros((4, 8, 2)), "img_mask": np.ones((4, 8))}
    mb = to_micro_batches(batch, 2)
    assert mb["x1"].shape == (2, 2, 8, 2)


def test_trainer_cli_smoke(tmp_path):
    """3 steps of the real CLI on a synthetic dataset with a tiny model."""
    from visualcloze_tpu.training.train import main

    random.seed(0)
    config = make_dataset_files(tmp_path)
    main(
        [
            "--data_path", config,
            "--results_dir", str(tmp_path / "results"),
            "--tiny", "--init_random",
            "--max_steps", "3",
            "--global_bsz", "2",
            "--micro_bsz", "1",
            "--grid_resolution", "64",
            "--lora_rank", "4",
            "--ckpt_every", "3",
            "--log_every", "1",
            "--num_workers", "2",
            "--max_seq_bucket", "128",
            "--fsdp", "2",
            "--use_model_ema",
            "--precision", "fp32",
        ]
    )
    ckpt_dir = tmp_path / "results" / "checkpoints" / "0000003"
    assert ckpt_dir.is_dir()
    assert (ckpt_dir / "consolidated.00-of-01.pth").exists()
    assert (ckpt_dir / "consolidated_ema.00-of-01.pth").exists()
    assert (ckpt_dir / "resume_step.txt").read_text() == "3"
    assert (ckpt_dir / "model_args.json").exists()

    # resume for 2 more steps
    main(
        [
            "--data_path", config,
            "--results_dir", str(tmp_path / "results"),
            "--tiny", "--init_random",
            "--max_steps", "5",
            "--global_bsz", "2",
            "--micro_bsz", "1",
            "--grid_resolution", "64",
            "--lora_rank", "4",
            "--ckpt_every", "2",
            "--log_every", "1",
            "--max_seq_bucket", "128",
            "--fsdp", "2",
            "--auto_resume",
            "--use_model_ema",
            "--precision", "fp32",
        ]
    )
    assert (tmp_path / "results" / "checkpoints" / "0000005").is_dir()


def test_trainer_cli_moe_lora_smoke(tmp_path):
    """--moe_experts with an ep mesh axis: 2 steps run, orbax checkpoint is
    written, and the torch-format export is correctly SKIPPED (MoE trees
    have no reference .pth format)."""
    from visualcloze_tpu.training.train import main

    random.seed(0)
    config = make_dataset_files(tmp_path)
    main(
        [
            "--data_path", config,
            "--results_dir", str(tmp_path / "results"),
            "--tiny", "--init_random",
            "--max_steps", "2",
            "--global_bsz", "2",
            "--micro_bsz", "1",
            "--grid_resolution", "64",
            "--lora_rank", "4",
            "--moe_experts", "4",
            "--ep", "2",
            "--fsdp", "2",
            "--ckpt_every", "2",
            "--log_every", "1",
            "--num_workers", "2",
            "--max_seq_bucket", "128",
            "--precision", "fp32",
        ]
    )
    ckpt_dir = tmp_path / "results" / "checkpoints" / "0000002"
    assert ckpt_dir.is_dir()
    assert (ckpt_dir / "state").is_dir()  # orbax state present
    assert not (ckpt_dir / "consolidated.00-of-01.pth").exists()  # no .pth format for MoE


def test_checkpoint_roundtrip(tmp_path):
    cfg = FluxConfig().tiny()
    params = init_flux(jax.random.PRNGKey(0), cfg)
    lora = init_lora(jax.random.PRNGKey(1), params, rank=4)
    opt = make_optimizer()
    state = init_train_state(params, lora, opt, "lora", use_ema=True)
    path = ckpt.save_checkpoint(str(tmp_path), 7, state, cfg, model_args={"lr": 1e-4})
    assert ckpt.find_latest_checkpoint(str(tmp_path)) == path
    restored = ckpt.load_checkpoint(path)
    assert int(restored["step"]) == 0  # state.step (not the dir step)
    for a, b in zip(jax.tree.leaves(state.lora), jax.tree.leaves(restored["lora"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert ckpt.load_resume_step(path) == 7

    # reference-format LoRA file reads back identically
    lora2 = ckpt.load_torch_lora(str(tmp_path / "0000007" / "consolidated.00-of-01.pth"), cfg)
    for a, b in zip(jax.tree.leaves(lora), jax.tree.leaves(lora2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_trainer_cli_with_sequence_parallelism(tmp_path):
    """One CLI step with --cp 2: ring attention over the cp mesh axis in the
    real jitted train step (SURVEY §5.7 — the SP the reference left as TODO)."""
    from visualcloze_tpu.training.train import main

    random.seed(0)
    config = make_dataset_files(tmp_path)
    main(
        [
            "--data_path", config,
            "--results_dir", str(tmp_path / "results_cp"),
            "--tiny", "--init_random",
            "--max_steps", "1",
            "--global_bsz", "2",
            "--micro_bsz", "1",
            "--grid_resolution", "64",
            "--lora_rank", "4",
            "--ckpt_every", "1",
            "--log_every", "1",
            "--num_workers", "1",
            "--max_seq_bucket", "128",
            "--fsdp", "2", "--cp", "2",
            "--precision", "fp32",
        ]
    )
    assert (tmp_path / "results_cp" / "checkpoints" / "0000001").is_dir()


def test_trainer_cli_with_pipeline_parallelism(tmp_path):
    """One CLI step with --pp 2: GPipe pipelining of the single trunk over a
    pp mesh axis in the real jitted train step (parallel/pipeline.py; beyond
    the reference, which has no pipeline parallelism — SURVEY §2.9)."""
    from visualcloze_tpu.training.train import main

    random.seed(0)
    config = make_dataset_files(tmp_path)
    main(
        [
            "--data_path", config,
            "--results_dir", str(tmp_path / "results_pp"),
            "--tiny", "--init_random",
            "--max_steps", "1",
            "--global_bsz", "4",
            "--micro_bsz", "2",
            "--grid_resolution", "64",
            "--lora_rank", "4",
            "--ckpt_every", "1",
            "--log_every", "1",
            "--num_workers", "1",
            "--max_seq_bucket", "128",
            "--fsdp", "2", "--pp", "2",
            "--precision", "fp32",
        ]
    )
    assert (tmp_path / "results_pp" / "checkpoints" / "0000001").is_dir()


def test_checkpoint_reshard_on_restore(tmp_path):
    """A checkpoint saved under one mesh restores onto a DIFFERENT mesh with
    the new shardings applied (the reference asserts same world size instead,
    train.py:446-453; without restore_into FSDP would silently replicate)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from visualcloze_tpu.parallel import create_mesh, replicate_tree, shard_params


    cfg = FluxConfig().tiny()
    mesh_a = create_mesh(fsdp=8)
    params_a = shard_params(init_flux(jax.random.PRNGKey(0), cfg), mesh_a)
    lora_a = replicate_tree(init_lora(jax.random.PRNGKey(1), params_a, rank=4), mesh_a)
    opt = make_optimizer()
    state_a = init_train_state(params_a, lora_a, opt, "lora", use_ema=False)
    path = ckpt.save_checkpoint(str(tmp_path), 5, state_a, cfg)

    mesh_b = create_mesh(fsdp=2, tp=2)
    params_b = shard_params(init_flux(jax.random.PRNGKey(7), cfg), mesh_b)
    lora_b = replicate_tree(init_lora(jax.random.PRNGKey(8), params_b, rank=4), mesh_b)
    state_b = init_train_state(params_b, lora_b, opt, "lora", use_ema=False)

    template = jax.device_get(
        {"params": state_b.params, "lora": state_b.lora,
         "opt_state": state_b.opt_state, "ema": state_b.ema, "step": state_b.step}
    )
    restored = ckpt.load_checkpoint(path, abstract_state=template)
    state_b = ckpt.restore_into(state_b, restored)

    # values come from the checkpoint; shardings come from mesh B
    for a, b in zip(jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    big = state_b.params["double_blocks"]["img_attn"]["qkv"]["w"]
    assert big.sharding.mesh.shape["fsdp"] == 2  # mesh B, not mesh A's 8
    assert big.sharding.mesh.shape["tp"] == 2


pytestmark = pytest.mark.slow  # 8-device mesh / full-stack CLI suite; fast lane skips


def test_trainer_preemption_checkpoint_and_resume(tmp_path):
    """SIGTERM mid-run (preemptible TPU semantics): the trainer finishes the
    in-flight step, saves a checkpoint at the step boundary, exits 0; a
    restart with --auto_resume continues from the preempted step."""
    import os
    import signal as _signal
    import subprocess
    import sys
    import time as _time

    random.seed(0)
    config = make_dataset_files(tmp_path)
    results = tmp_path / "results_preempt"
    args = [
        "--data_path", config, "--results_dir", str(results),
        "--tiny", "--init_random", "--max_steps", "50",
        "--global_bsz", "2", "--micro_bsz", "1", "--grid_resolution", "64",
        "--lora_rank", "4", "--ckpt_every", "50", "--log_every", "1",
        "--num_workers", "1", "--max_seq_bucket", "128", "--fsdp", "2",
        "--auto_resume", "--precision", "fp32",
    ]
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "from visualcloze_tpu.training.train import main; import sys;"
        "main(sys.argv[1:])"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    proc = subprocess.Popen(
        [sys.executable, "-c", code, *args],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
    )
    # wait for the first optimizer step to be logged, then preempt
    deadline = _time.time() + 420
    lines = []
    for line in proc.stdout:
        lines.append(line)
        if "step 1 loss" in line or _time.time() > deadline:
            break
    assert any("step 1 loss" in ln for ln in lines), "".join(lines)[-2000:]
    proc.send_signal(_signal.SIGTERM)
    out = proc.stdout.read()
    assert proc.wait(timeout=300) == 0, out[-2000:]
    assert "preempted at step" in out, out[-2000:]

    ckpts = sorted((results / "checkpoints").iterdir())
    assert ckpts, "no preemption checkpoint saved"
    saved_step = int((ckpts[-1] / "resume_step.txt").read_text())
    assert 0 < saved_step < 50

    # restart: auto_resume picks up the preemption checkpoint
    from visualcloze_tpu.training.train import main

    args[args.index("--max_steps") + 1] = str(saved_step + 1)
    main(args)
    assert (results / "checkpoints" / f"{saved_step + 1:07d}").is_dir()


def test_trainer_rejects_cp_pp_combination(tmp_path):
    """--cp x --pp would nest ring attention's shard_map inside the
    pipeline's (trace-time crash) — the CLI must refuse up front; same for
    the unimplemented dots_split-under-pp remat."""
    from visualcloze_tpu.training.train import main

    random.seed(0)
    config = make_dataset_files(tmp_path)
    base = [
        "--data_path", config, "--results_dir", str(tmp_path / "r"),
        "--tiny", "--init_random", "--max_steps", "1", "--global_bsz", "2",
        "--micro_bsz", "1", "--grid_resolution", "64", "--lora_rank", "4",
        "--max_seq_bucket", "128", "--precision", "fp32",
    ]
    with pytest.raises(SystemExit, match="cannot be combined"):
        main(base + ["--cp", "2", "--pp", "2"])
    with pytest.raises(SystemExit, match="dots_split"):
        main(base + ["--pp", "2", "--fsdp", "2", "--remat_policy", "dots_split"])
