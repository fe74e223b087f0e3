"""GSPMD sharding rules for Flux parameters and activations.

TPU-native replacement for torch FSDP FULL_SHARD / SHARD_GRAD_OP
(train.py:152-185, SURVEY.md §2.9 items 3-4): instead of runtime parameter
flattening + NCCL all-gathers, each weight carries a NamedSharding and XLA
inserts the all-gather/reduce-scatter schedule.

Rules (megatron-style TP + FSDP, composable on one mesh):
  - column-parallel (output-dim tp): qkv, linear1, mlp "0" layers,
  - row-parallel (input-dim tp): attention proj, linear2, mlp "2" layers,
  - everything else: tp-replicated,
  - fsdp shards the remaining large dim of every 2D+ weight,
  - 1D params (biases of row-parallel + norms) replicated; column-parallel
    biases follow their output sharding.

The reference has no working TP (model_parallel_size=1 scaffolding,
util/parallel.py:48) — here it falls out of the same annotations.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Params = dict[str, Any]

# path suffixes (module, leaf-parent) classifying linears
_COLUMN_KEYS = ("qkv", "linear1")
_ROW_KEYS = ("proj", "linear2")


def _classify(path: tuple[str, ...]) -> str:
    """-> 'column' | 'row' | 'other' for a linear's parent path."""
    for key in path:
        if key in _COLUMN_KEYS:
            return "column"
        if key in _ROW_KEYS:
            return "row"
    # mlp Sequential naming: img_mlp/txt_mlp {"0": in-proj, "2": out-proj}
    for a, b in zip(path, path[1:]):
        if a in ("img_mlp", "txt_mlp"):
            return "column" if b == "0" else "row"
    return "other"


def _path_keys(key_path) -> tuple[str, ...]:
    keys = []
    for k in key_path:
        if hasattr(k, "key"):
            keys.append(str(k.key))
        elif hasattr(k, "idx"):
            keys.append(str(k.idx))
        else:
            keys.append(str(k))
    return tuple(keys)


def _divisible(dim: int, mesh: Mesh, axis: str) -> bool:
    return mesh.shape[axis] > 0 and dim % mesh.shape[axis] == 0


def flux_param_spec(key_path, leaf, mesh: Mesh, no_fsdp: bool = False) -> P:
    """PartitionSpec for one Flux parameter leaf.

    Weight layouts: top-level w (in, out); stacked block w (depth, in, out);
    biases (out,) or (depth, out); norm scales 1D/2D.

    no_fsdp: suppress the fsdp dim (tp/ep/pp still apply) — the ZeRO-2
    ("sdp", ref train.py:160-163 SHARD_GRAD_OP) parameter placement, where
    params stay replicated over the data axis and only gradients + optimizer
    state shard (see init_train_state's opt_mesh).
    """
    path = _path_keys(key_path)
    kind = _classify(path)
    leaf_name = path[-1]
    stacked = path[0] in ("double_blocks", "single_blocks")
    shape = leaf.shape

    fsdp = "fsdp" if mesh.shape["fsdp"] > 1 and not no_fsdp else None
    tp = "tp" if mesh.shape["tp"] > 1 else None
    # pp (parallel/pipeline.py) owns the single trunk: its stacked leaves
    # shard stage-wise on the depth axis (axis 0); everything else is
    # pp-replicated (the embedders/doubles run data-parallel across pp).
    pp = (
        "pp"
        if mesh.shape.get("pp", 1) > 1 and path[0] == "single_blocks"
        and shape and shape[0] % mesh.shape["pp"] == 0
        else None
    )

    if leaf_name in ("w", "w_int8"):  # int8-quantized weights shard like w
        in_dim, out_dim = shape[-2], shape[-1]
        spec: list = [None] * len(shape)
        if pp:
            spec[0] = pp
        if kind == "column":
            if tp and _divisible(out_dim, mesh, "tp"):
                spec[-1] = tp
            if fsdp and _divisible(in_dim, mesh, "fsdp"):
                spec[-2] = fsdp
        elif kind == "row":
            if tp and _divisible(in_dim, mesh, "tp"):
                spec[-2] = tp
            if fsdp and _divisible(out_dim, mesh, "fsdp"):
                spec[-1] = fsdp
        else:
            # fsdp only, on the biggest divisible dim
            if fsdp and _divisible(in_dim, mesh, "fsdp"):
                spec[-2] = fsdp
            elif fsdp and _divisible(out_dim, mesh, "fsdp"):
                spec[-1] = fsdp
        return P(*spec)

    if leaf_name in ("b", "b_bias", "w_scale"):  # per-out-channel vectors
        spec = [None] * len(shape)
        if kind == "column" and tp and _divisible(shape[-1], mesh, "tp"):
            spec[-1] = tp
        if pp and len(shape) > 1:
            spec[0] = pp
        return P(*spec)

    if leaf_name == "a":  # lora A (in, r): follow fsdp on in-dim
        spec = [None] * len(shape)
        if fsdp and _divisible(shape[-2], mesh, "fsdp"):
            spec[-2] = fsdp
        if pp and len(shape) > 2:
            spec[0] = pp
        return P(*spec)

    if leaf_name in ("shared_a",):  # MoE-LoRA shared A: like lora A
        spec = [None] * len(shape)
        if fsdp and _divisible(shape[-2], mesh, "fsdp"):
            spec[-2] = fsdp
        if pp and len(shape) > 2:
            spec[0] = pp
        return P(*spec)

    if leaf_name in ("expert_a", "expert_b"):
        # (..., E, in, r) / (..., E, r, out): experts over the ep axis;
        # GSPMD inserts the single psum over experts in the combine einsum
        spec = [None] * len(shape)
        ep = "ep" if mesh.shape.get("ep", 1) > 1 else None
        if ep and _divisible(shape[-3], mesh, "ep"):
            spec[-3] = ep
        if pp and len(shape) > 3:
            spec[0] = pp
        return P(*spec)

    # norm scales and anything else: replicated (stage-sharded on the
    # stacked axis under pp)
    del stacked
    spec = [None] * len(shape)
    if pp and len(shape) > 1:
        spec[0] = pp
    return P(*spec)


def make_flux_shardings(params: Params, mesh: Mesh, no_fsdp: bool = False) -> Params:
    """Pytree of NamedShardings matching `params` (also fits LoRA trees:
    lora 'b' factors (r, out) follow column bias rules via leaf names)."""
    return jax.tree_util.tree_map_with_path(
        lambda kp, leaf: NamedSharding(mesh, flux_param_spec(kp, leaf, mesh, no_fsdp)),
        params,
    )


def shard_params(params: Params, mesh: Mesh, mode: str = "fsdp") -> Params:
    """Place (or re-place) a parameter pytree onto the mesh.

    mode="fsdp" (default): ZeRO-3 — weights sharded over the fsdp axis
    (+ tp/ep/pp rules). mode="sdp": ZeRO-2 — weights REPLICATED over fsdp
    (tp/ep/pp rules still apply); pair with init_train_state(opt_mesh=mesh)
    so gradients/optimizer state shard over fsdp (ref train.py:160-163
    SHARD_GRAD_OP)."""
    if mode not in ("fsdp", "sdp"):
        raise ValueError(f"unknown shard_params mode {mode!r}")
    shardings = make_flux_shardings(params, mesh, no_fsdp=(mode == "sdp"))
    return jax.tree.map(jax.device_put, params, shardings)


def shard_large_params(tree: Params, mesh: Mesh, min_size: int = 1 << 20) -> Params:
    """Generic FSDP-style sharding for auxiliary models (frozen T5/CLIP, VAE):
    every large weight is sharded along its biggest fsdp-divisible dim,
    small leaves replicated. Replaces the reference's intra-node FSDP of the
    frozen encoders (train.py:133-149, SURVEY.md §2.9 item 6) — on TPU the
    fsdp mesh dim is ICI-local by construction (axis order, mesh.py)."""
    fsdp = mesh.shape["fsdp"]

    def spec_for(leaf):
        if fsdp <= 1 or leaf.size < min_size:
            return P(*([None] * leaf.ndim))
        dims = sorted(range(leaf.ndim), key=lambda d: -leaf.shape[d])
        for d in dims:
            if leaf.shape[d] % fsdp == 0:
                spec = [None] * leaf.ndim
                spec[d] = "fsdp"
                return P(*spec)
        return P(*([None] * leaf.ndim))

    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, spec_for(x))), tree
    )


def replicate_tree(tree: Params, mesh: Mesh) -> Params:
    rep = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, rep), tree)


def activation_spec(mesh: Mesh) -> P:
    """(B, L, D) activations: batch over (dp, fsdp)."""
    return P(("dp", "fsdp"))


def constrain_batch(x, mesh: Mesh):
    if mesh.shape["dp"] * mesh.shape["fsdp"] > 1:
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(("dp", "fsdp")))
        )
    return x


def shard_micro_batches(batch: dict, mesh: Mesh) -> dict:
    """Place an (accum, batch, ...) micro-batch dict onto the mesh with the
    batch dim split over (dp, fsdp) — torch-FSDP data-parallel semantics
    (ref train.py:152-185). Single-host: plain device_put of the global
    batch; multi-host: each process contributes its local shard."""
    sh = NamedSharding(mesh, P(None, ("dp", "fsdp")))
    if jax.process_count() == 1:
        return {k: jax.device_put(v, sh) for k, v in batch.items()}
    import numpy as np

    return {
        k: jax.make_array_from_process_local_data(sh, np.asarray(v))
        for k, v in batch.items()
    }
