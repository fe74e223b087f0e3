"""LoRA as a functional transform over parameter pytrees.

TPU-native counterpart of the reference's nn.Linear-subclassing LoRA
(models/modules/lora.py:5-98 LinearLora / replace_linear_with_lora):
  - `init_lora` walks a parameter pytree and attaches an (A, B, B-bias)
    factor to every linear (every dict carrying a "w"), with the rank clamped
    to min(in, out) exactly like the reference (lora.py:66-67), B zero-init,
    and lora_bias=True parity (lora.py:77-88),
  - at train time the factors ride along as a separate pytree (the only
    trainable leaves for training_type="lora"),
  - at inference `fold_lora` merges W += scale * A @ B (and b += scale * b_B)
    so the sampling hot loop runs on plain dense weights — zero runtime
    overhead, the TPU-idiomatic equivalent of runtime-added deltas.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]


def _is_linear(node: Any) -> bool:
    # int8/w8a8-quantized linears carry "w_int8" instead of "w" (models/
    # quant.py) but are equally valid runtime-adapter attachment points.
    return isinstance(node, dict) and ("w" in node or "w_int8" in node)


def _linear_shape(node: dict) -> tuple:
    return (node["w"] if "w" in node else node["w_int8"]).shape


def init_lora(
    key: jax.Array,
    params: Params,
    rank: int,
    dtype=jnp.float32,
) -> Params:
    """Build a LoRA pytree mirroring `params`' linear layers.

    Stacked block weights (leading depth axis) get stacked factors.
    """
    flat: list[tuple[tuple, Any]] = []

    def walk(node, path):
        if _is_linear(node):
            flat.append((path, node))
            return
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))

    walk(params, ())
    keys = jax.random.split(key, len(flat))
    out: Params = {}
    for (path, lin), k in zip(flat, keys):
        *lead, d_in, d_out = _linear_shape(lin)
        r = min(rank, d_in, d_out)
        bound = d_in ** -0.5  # torch nn.Linear default init for lora_A
        a = jax.random.uniform(k, (*lead, d_in, r), jnp.float32, -bound, bound)
        entry = {
            "a": a.astype(dtype),
            "b": jnp.zeros((*lead, r, d_out), dtype),
            "b_bias": jnp.zeros((*lead, d_out), dtype),
        }
        node = out
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = entry
    return out


def randomize_lora_b(lora: Params, key: jax.Array, scale: float = 0.02) -> Params:
    """Replace the zero-init "b" factors with small random values, making the
    adapter a visible (but bounded) perturbation. Demo/test seam: a freshly
    init_lora'd adapter is a mathematical no-op (B=0, reference lora.py
    zero-init), which is correct for training but useless for exercising the
    runtime-adapter serving path."""
    import zlib

    import jax.tree_util as jtu

    def f(path, x):
        # MoE-LoRA trees keep their zero-init output factors under
        # shared_b/expert_b — skipping them would leave the adapter delta
        # mathematically zero (gated experts multiply into expert_b)
        if getattr(path[-1], "key", None) not in ("b", "shared_b", "expert_b"):
            return x
        k = jax.random.fold_in(key, zlib.crc32(jtu.keystr(path).encode()))
        return scale * jax.random.normal(k, x.shape, x.dtype)

    return jtu.tree_map_with_path(f, lora)


def init_moe_lora(
    key: jax.Array,
    params: Params,
    rank: int,
    num_experts: int,
    dtype=jnp.float32,
) -> Params:
    """Build a Mixture-of-LoRA-Experts pytree mirroring `params`' linears.

    A WORKING TPU-native realization of the reference's dead
    MixtureOfLoRAExperts (models/modules/lora.py:101-199 — Chinese-commented,
    references an undefined `F`, per-sample Python routing loops; never
    constructed by any entry point). Same parameterization and init:
      - shared LoRA pair (shared_a uniform, shared_b zeros),
      - per-expert LoRA pairs stacked on a leading expert axis
        (expert_a uniform, expert_b zeros),
      - token-wise softmax gate (weight std 0.01, bias zeros), top-2 routing.
    Entries drop into the same runtime slots as plain LoRA (flux_apply's
    `lora=` pytree); models/layers._lora_delta dispatches on "expert_a".
    Expert leaves shard over an `ep` mesh axis (parallel/sharding.py).
    """
    flat: list[tuple[tuple, Any]] = []

    def walk(node, path):
        if _is_linear(node):
            flat.append((path, node))
            return
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))

    walk(params, ())
    keys = jax.random.split(key, len(flat))
    out: Params = {}
    for (path, lin), k in zip(flat, keys):
        *lead, d_in, d_out = _linear_shape(lin)
        r = min(rank, d_in, d_out)
        k_sh, k_ex, k_gate = jax.random.split(k, 3)
        bound = d_in ** -0.5  # torch nn.Linear default init for the A factors
        entry = {
            "shared_a": jax.random.uniform(
                k_sh, (*lead, d_in, r), jnp.float32, -bound, bound
            ).astype(dtype),
            "shared_b": jnp.zeros((*lead, r, d_out), dtype),
            "expert_a": jax.random.uniform(
                k_ex, (*lead, num_experts, d_in, r), jnp.float32, -bound, bound
            ).astype(dtype),
            "expert_b": jnp.zeros((*lead, num_experts, r, d_out), dtype),
            # gate: normal(std 0.01) weight, zero bias (ref lora.py:152-157)
            "gate_w": (
                0.01 * jax.random.normal(k_gate, (*lead, d_in, num_experts), jnp.float32)
            ).astype(dtype),
            "gate_b": jnp.zeros((*lead, num_experts), dtype),
        }
        node = out
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = entry
    return out


def is_moe_lora(lora: Params) -> bool:
    """True if any entry in the tree is a Mixture-of-LoRA-Experts entry."""
    found = [False]

    def walk(node):
        if isinstance(node, dict):
            if "expert_a" in node:
                found[0] = True
                return
            for v in node.values():
                walk(v)

    walk(lora)
    return found[0]


def fold_lora(params: Params, lora: Params, scale: float = 1.0) -> Params:
    """Merge LoRA factors into base weights: W += scale*A@B, b += scale*b_B.

    Returns a new params pytree (inputs untouched).
    """

    def merge(p_node, l_node):
        if _is_linear(p_node):
            if l_node is None:
                return p_node
            if "expert_a" in l_node:
                raise ValueError(
                    "MoE-LoRA entries are input-gated and cannot be folded into "
                    "dense weights; serve with flux_apply(..., lora=moe_tree) instead"
                )
            if "w" not in p_node:
                raise ValueError(
                    "cannot fold LoRA into int8-quantized weights; keep the "
                    "adapter runtime (add_adapter) or fold before quantization"
                )
            w = p_node["w"]
            delta = jnp.einsum(
                "...ir,...ro->...io",
                l_node["a"].astype(jnp.float32),
                l_node["b"].astype(jnp.float32),
            ) * scale
            new = dict(p_node)
            new["w"] = (w.astype(jnp.float32) + delta).astype(w.dtype)
            if "b_bias" in l_node:
                b = p_node.get("b")
                bb = l_node["b_bias"].astype(jnp.float32) * scale
                if b is None:
                    new["b"] = bb.astype(w.dtype)
                else:
                    new["b"] = (b.astype(jnp.float32) + bb).astype(b.dtype)
            return new
        if isinstance(p_node, dict):
            return {
                k: merge(v, l_node.get(k) if isinstance(l_node, dict) else None)
                for k, v in p_node.items()
            }
        return p_node

    return merge(params, lora)


def lora_param_count(lora: Params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(lora))
