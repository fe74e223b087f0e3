"""Device mesh construction.

TPU-native replacement for the reference's process-group zoo
(util/parallel.py:43-92: NCCL world group, fairscale dp/mp groups, intra-node
and inter-node groups — SURVEY.md §2.9 items 2, 5, 6). One
jax.sharding.Mesh with axes (dp, fsdp, tp) subsumes them all:
  - dp:   pure data parallelism (reference: fairscale DP group),
  - fsdp: parameter/optimizer sharding (reference: FSDP FULL_SHARD),
  - tp:   tensor parallelism (reference: scaffolding only, size 1 —
          first-class here because GSPMD gives it by annotation).
Axis order is ICI-friendly: tp innermost (highest-bandwidth neighbor links),
dp outermost (maps to DCN when multi-slice).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("pp", "dp", "fsdp", "tp", "cp", "ep")


def create_mesh(
    dp: int = 1,
    fsdp: int = 1,
    tp: int = 1,
    cp: int = 1,
    ep: int = 1,
    pp: int = 1,
    devices: list | None = None,
) -> Mesh:
    """Build a (pp, dp, fsdp, tp, cp, ep) mesh over the given (default: all)
    devices. cp = sequence/context parallelism (ring attention,
    ops/ring_attention.py); ep = expert parallelism (MoE-LoRA expert leaves,
    parallel/sharding.py). Both innermost so their collectives (ppermute /
    expert psum) ride nearest-neighbor ICI links. pp = pipeline parallelism
    (GPipe microbatching of the single trunk, parallel/pipeline.py) —
    OUTERMOST: its once-per-tick activation hop is the only axis cheap
    enough to cross DCN, so pp maps to the slice boundary when multi-slice."""
    devices = devices if devices is not None else jax.devices()
    n = dp * fsdp * tp * cp * ep * pp
    if n > len(devices):
        raise ValueError(
            f"mesh {pp}x{dp}x{fsdp}x{tp}x{cp}x{ep}={n} exceeds {len(devices)} devices"
        )
    arr = np.asarray(devices[:n]).reshape(pp, dp, fsdp, tp, cp, ep)
    return Mesh(arr, AXES)


def auto_mesh(n_devices: int | None = None, mode: str = "inference") -> Mesh:
    """Sensible defaults: inference -> all-tp on one slice (latency),
    training -> all-fsdp (reference parity: FSDP FULL_SHARD)."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if mode == "inference":
        return create_mesh(tp=n, devices=devices)
    return create_mesh(fsdp=n, devices=devices)


def initialize_distributed() -> None:
    """Multi-host bootstrap (replaces torch.distributed NCCL init + SLURM
    rendezvous, util/parallel.py:13-48). No-op on single-host.

    Triggers jax.distributed.initialize() — which auto-detects coordinator /
    rank from its cluster plugins — when any multi-host signal is present:
      - JAX_COORDINATOR_ADDRESS (explicit, torchrun-MASTER_ADDR equivalent),
      - SLURM with >1 node (the reference's sinfo bootstrap case),
      - a multi-host TPU pod (MEGASCALE_COORDINATOR_ADDRESS / TPU worker env).
    """
    import os

    env = os.environ
    multi_host = (
        env.get("JAX_COORDINATOR_ADDRESS")
        or int(env.get("SLURM_JOB_NUM_NODES", "1")) > 1
        or env.get("MEGASCALE_COORDINATOR_ADDRESS")
        or "," in env.get("TPU_WORKER_HOSTNAMES", "")
    )
    if multi_host:
        jax.distributed.initialize()


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch split over dp and fsdp axes (FSDP also consumes batch, matching
    torch FSDP's data-parallel semantics)."""
    return NamedSharding(mesh, P(("dp", "fsdp")))
