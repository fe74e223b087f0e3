"""Checkpoint save/resume.

Counterpart of the reference's checkpointing (train.py:680-752 save,
:307-377/:445-471 resume):
  - full train state via Orbax (resharding-on-restore for free — the
    reference's same-world-size assert, train.py:446-453, disappears),
  - a consolidated LoRA-only export in the reference's torch naming
    (consolidated.00-of-01.pth with lora_A/lora_B keys) so checkpoints
    interoperate with the reference pipeline,
  - model_args.json + resume_step.txt, auto-resume from the latest step dir.
"""

from __future__ import annotations

import json
import os
import re
from pathlib import Path
from typing import Any

import jax
import numpy as np

from ..config import FluxConfig
from ..models.weights import convert_lora, lora_to_torch_state
from .step import TrainState


def save_checkpoint(
    ckpt_root: str,
    step: int,
    state: TrainState,
    flux_cfg: FluxConfig,
    model_args: dict[str, Any] | None = None,
    save_ema: bool = True,
) -> str:
    """Write {ckpt_root}/{step:07d}/ with orbax state + LoRA torch export."""
    import orbax.checkpoint as ocp

    ckpt_dir = Path(ckpt_root) / f"{step:07d}"
    ckpt_dir.mkdir(parents=True, exist_ok=True)

    with ocp.PyTreeCheckpointer() as ckptr:
        # the jax.Arrays go to orbax as-is: it writes per-shard (multi-host
        # safe — FSDP leaves are not addressable from one process there) and
        # never gathers the full state into host RAM
        ckptr.save(
            (ckpt_dir / "state").absolute(),
            {
                "params": state.params,
                "lora": state.lora,
                "opt_state": state.opt_state,
                "ema": state.ema,
                "step": state.step,
            },
        )

    from ..models.lora import is_moe_lora

    # Host-side sidecar files are written by process 0 ONLY. The orbax save
    # above is collective (every process contributes its shards to the shared
    # checkpoint directory), but these are whole-file writes: N processes
    # writing the same multi-hundred-MB .pth to one shared-filesystem path
    # concurrently interleave into a corrupt file — which would still look
    # committed once resume_step.txt lands.
    if jax.process_index() == 0:
        if state.lora is not None and not is_moe_lora(state.lora):
            # MoE-LoRA trees have no reference .pth format (the reference's
            # MixtureOfLoRAExperts is dead code); they live in the orbax state
            _save_torch_lora(ckpt_dir / "consolidated.00-of-01.pth", state.lora, flux_cfg)
            if save_ema and state.ema is not None:
                _save_torch_lora(ckpt_dir / "consolidated_ema.00-of-01.pth", state.ema, flux_cfg)

        if model_args is not None:
            (ckpt_dir / "model_args.json").write_text(json.dumps(model_args, indent=2))
        # written LAST: doubles as the commit marker — find_latest_checkpoint
        # ignores directories without it, so a save interrupted mid-write (chip
        # preemption) can never brick or silently zero-step an --auto_resume
        (ckpt_dir / "resume_step.txt").write_text(str(step))
    return str(ckpt_dir)


def _save_torch_lora(path: Path, lora, flux_cfg: FluxConfig) -> None:
    import torch

    state = lora_to_torch_state(jax.device_get(lora), flux_cfg)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in state.items()}, path)


def find_latest_checkpoint(ckpt_root: str) -> str | None:
    """Latest COMPLETE step directory (ref train.py:307-316 auto_resume).

    Completeness = resume_step.txt present (save_checkpoint writes it last);
    a directory from an interrupted save is skipped so auto-resume falls
    back to the previous good checkpoint."""
    root = Path(ckpt_root)
    if not root.is_dir():
        return None
    dirs = sorted(
        d for d in root.iterdir()
        if re.fullmatch(r"\d{7}", d.name) and (d / "resume_step.txt").exists()
    )
    return str(dirs[-1]) if dirs else None


def load_checkpoint(ckpt_dir: str, abstract_state: dict | None = None) -> dict:
    """Restore the orbax state pytree written by save_checkpoint."""
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        if abstract_state is not None:
            return ckptr.restore(Path(ckpt_dir, "state").absolute(), item=abstract_state)
        return ckptr.restore(Path(ckpt_dir, "state").absolute())


def restore_into(state: TrainState, restored: dict) -> TrainState:
    """Place a restored (host) state pytree back onto the CURRENT state's
    shardings — true reshard-on-restore: the saved mesh shape is irrelevant
    (the reference instead asserts the same world size, train.py:446-453).
    Without this, plain jnp.asarray leaves would silently replicate FSDP
    params per device on resume."""
    import jax.numpy as jnp

    def place(template_leaf, restored_leaf):
        sharding = getattr(template_leaf, "sharding", None)
        # only re-commit mesh-sharded leaves; single-device leaves stay
        # uncommitted so jit remains free to co-locate them. device_put goes
        # straight from the HOST array so no device ever holds the full
        # unsharded leaf (a 12B fp32 qkv stack alone is ~2 GB).
        if isinstance(sharding, jax.sharding.NamedSharding):
            return jax.device_put(np.asarray(restored_leaf), sharding)
        return jnp.asarray(restored_leaf)

    def place_tree(template, tree):
        if tree is None:
            return None
        return jax.tree.map(place, template, tree)

    return state._replace(
        step=place(state.step, restored["step"]),
        params=place_tree(state.params, restored["params"]),
        lora=place_tree(state.lora, restored["lora"]),
        opt_state=place_tree(state.opt_state, restored["opt_state"]),
        ema=place_tree(state.ema, restored["ema"]),
    )


def load_resume_step(ckpt_dir: str) -> int:
    path = Path(ckpt_dir) / "resume_step.txt"
    return int(path.read_text().strip()) if path.exists() else 0


def load_torch_lora(path: str, flux_cfg: FluxConfig):
    """Read a reference-format consolidated LoRA checkpoint back into a
    LoRA pytree (for init_from / pipeline loading)."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    return convert_lora({k: v for k, v in state.items()}, flux_cfg)
