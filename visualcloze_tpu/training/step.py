"""Training step: masked velocity loss, gradient accumulation, EMA, selective
trainability.

TPU-native counterpart of the reference train loop internals
(train.py:417-444 selective trainability, :606-636 micro-batch accumulation,
:638 grad clip, :92-102/:676-677 EMA). Differences, all by design:
  - the whole step (accumulation loop included) is ONE jitted function — the
    reference's per-micro-batch Python loop with FSDP no_sync becomes a
    lax.scan over the micro-batch axis,
  - FSDP is a sharding annotation (parallel/sharding.py), not wrapper
    machinery; "sdp" (SHARD_GRAD_OP) is the same step with replicated params,
  - master weights fp32, compute bf16 via param casting (the reference gets
    this from FSDP MixedPrecision param_dtype=bf16 / reduce fp32).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import FluxConfig
from ..models.flux import flux_apply
from ..transport import Transport

Params = dict[str, Any]

TRAINING_TYPES = ("lora", "full_model", "double_block", "bias", "norm")


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Params  # base weights (fp32 masters)
    lora: Params | None  # LoRA factors (fp32); None for full-model training
    opt_state: Any
    ema: Params | None  # EMA of the trainable tree


def trainable_mask(params: Params, training_type: str) -> Params:
    """Boolean mask over `params` for name-filtered trainability
    (ref train.py:417-444)."""
    def mask_leaf(key_path, leaf):
        keys = [str(getattr(k, "key", getattr(k, "idx", k))) for k in key_path]
        if training_type == "full_model":
            return True
        if training_type == "double_block":
            return keys[0] == "double_blocks"
        if training_type == "bias":
            return keys[-1] in ("b", "bias")
        if training_type == "norm":
            return keys[-1] in ("q_scale", "k_scale", "scale", "ln")
        raise ValueError(training_type)

    return jax.tree_util.tree_map_with_path(mask_leaf, params)


def make_optimizer(
    lr: float = 1e-4,
    weight_decay: float = 0.0,
    grad_clip: float = 2.0,
    mask: Params | None = None,
) -> optax.GradientTransformation:
    """AdamW with global-norm clipping (ref train.py:442-444, :638).

    `mask` freezes the False leaves entirely (reference requires_grad
    filtering, train.py:417-444): frozen leaves get zero updates, and the
    global-norm clip sees only trainable gradients.
    """
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(lr, b1=0.9, b2=0.95, weight_decay=weight_decay),
    )
    if mask is not None:
        labels = jax.tree.map(lambda m: "train" if m else "freeze", mask)
        tx = optax.multi_transform({"train": tx, "freeze": optax.set_to_zero()}, labels)
    return tx


def update_ema(ema: Params, new: Params, decay: float = 0.95) -> Params:
    """ema = decay * ema + (1 - decay) * new (ref train.py:92-102).

    `ema` may be a mask-pruned SUBTREE of `new` (init_train_state with a
    trainability mask): dict nodes are walked by ema's own keys, so frozen
    branches absent from ema are simply never touched."""
    if isinstance(ema, dict):
        return {k: update_ema(v, new[k], decay) for k, v in ema.items()}
    return decay * ema + (1.0 - decay) * new


def prune_to_mask(tree: Params, mask: Params | None):
    """Subtree of `tree` keeping only mask-True leaves (emptied dicts are
    dropped). mask=None keeps everything."""
    if mask is None:
        return tree
    if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
            sub = prune_to_mask(v, mask[k])
            if sub is not None:
                out[k] = sub
        return out or None
    return tree if mask else None


def init_train_state(
    params: Params,
    lora: Params | None,
    optimizer: optax.GradientTransformation,
    training_type: str = "lora",
    use_ema: bool = False,
    mask: Params | None = None,
    opt_mesh=None,
) -> TrainState:
    """mask (the trainable_mask for bias/norm/double_block modes) prunes the
    EMA to the leaves that can ever change — a full-tree EMA for bias
    training would duplicate the entire fp32 base (~48 GB at 12B) in memory
    and in every checkpoint while frozen leaves satisfy ema == param
    identically.

    opt_mesh: ZeRO-2 ("sdp") — shard the optimizer moments (and the EMA)
    over this mesh's fsdp axis even though the params stay replicated
    (shard_params mode="sdp"); the jitted step then reduce-scatters grads
    into the sharded moments and all-gathers the updates back
    (ref train.py:160-163 SHARD_GRAD_OP)."""
    trainable = lora if training_type == "lora" else params

    def make_ema(t):
        return jax.tree.map(jnp.copy, prune_to_mask(t, mask))

    if opt_mesh is None:
        opt_state = optimizer.init(trainable)
        ema = make_ema(trainable) if use_ema else None
    else:
        from jax.sharding import NamedSharding

        from ..parallel.sharding import flux_param_spec

        # opt_state/ema leaf paths end in the same param-tree suffixes
        # ('...qkv.w', '...lora.a'), so the fsdp/tp spec rules apply directly;
        # scalar counters get P() (replicated). Shardings are derived from
        # eval_shape and pinned as jit out_shardings so the moments are
        # ALLOCATED 1/fsdp-sharded — an eager optimizer.init on the
        # replicated ZeRO-2 params would materialize the full mu+nu
        # (~2x param bytes) on every device before resharding, OOMing at
        # startup exactly the large-model configs --sdp exists for.
        def shardings_for(abstract):
            return jax.tree_util.tree_map_with_path(
                lambda kp, leaf: NamedSharding(
                    opt_mesh, flux_param_spec(kp, leaf, opt_mesh)
                ),
                abstract,
            )

        opt_sh = shardings_for(jax.eval_shape(optimizer.init, trainable))
        opt_state = jax.jit(optimizer.init, out_shardings=opt_sh)(trainable)
        ema = None
        if use_ema:
            ema_sh = shardings_for(jax.eval_shape(make_ema, trainable))
            ema = jax.jit(make_ema, out_shardings=ema_sh)(trainable)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        lora=lora,
        opt_state=opt_state,
        ema=ema,
    )


def make_train_step(
    cfg: FluxConfig,
    transport: Transport,
    optimizer: optax.GradientTransformation,
    training_type: str = "lora",
    ema_decay: float | None = 0.95,
    attn_impl: str = "auto",
    remat: bool = True,
    remat_policy: str | None = "dots",
    compute_dtype=jnp.bfloat16,
    mesh=None,
    pp_microbatches: int | None = None,
):
    """Build the jitted train step.

    remat_policy: None = full recompute (reference checkpoint_wrapper parity);
    "dots" = save matmul outputs, recompute elementwise (cheaper backward at
    higher activation memory — pick per memory budget).

    The returned step takes batches shaped (accum, micro_bs, ...) — accum=1
    for no accumulation — and scans micro-batches, averaging gradients
    (ref train.py:606-636).

    mesh/pp_microbatches: when the mesh has a pp axis > 1, the forward runs
    through parallel/pipeline.flux_apply_pp (GPipe pipelining of the single
    trunk) with micro_bs split into pp_microbatches (default pp) per
    micro-batch; the backward is the reverse pipeline via jax.grad.

    Batch dict fields: x1 (clean tokens), cond (conditioning tokens),
    img_ids, img_mask, txt, txt_ids, txt_mask, vec.
    """
    if training_type not in TRAINING_TYPES:
        raise ValueError(training_type)
    is_lora = training_type == "lora"
    use_pp = mesh is not None and mesh.shape.get("pp", 1) > 1
    if use_pp and pp_microbatches is None:
        pp_microbatches = mesh.shape["pp"]

    def cast(tree):
        return jax.tree.map(
            lambda x: x.astype(compute_dtype) if x.dtype == jnp.float32 else x, tree
        )

    def loss_fn(trainable, state: TrainState, micro: dict, key):
        params = state.params if is_lora else trainable
        lora = trainable if is_lora else state.lora
        cparams = cast(params)
        clora = cast(lora) if lora is not None else None

        def model_fn(img, timesteps, **kw):
            if use_pp:
                from ..parallel.pipeline import flux_apply_pp

                return flux_apply_pp(
                    cfg, cparams, mesh,
                    microbatches=pp_microbatches,
                    img=img.astype(compute_dtype),
                    timesteps=timesteps,
                    lora=clora,
                    attn_impl=attn_impl,
                    remat=remat,
                    remat_policy=remat_policy,
                    **kw,
                )
            return flux_apply(
                cfg, cparams,
                img=img.astype(compute_dtype),
                timesteps=timesteps,
                lora=clora,
                attn_impl=attn_impl,
                remat=remat,
                remat_policy=remat_policy,
                **kw,
            )

        model_kwargs = dict(
            img_ids=micro["img_ids"],
            txt=micro["txt"].astype(compute_dtype),
            txt_ids=micro["txt_ids"],
            txt_mask=micro["txt_mask"],
            img_mask=micro["img_mask"],
            y=micro["vec"].astype(compute_dtype),
            guidance=jnp.ones((micro["x1"].shape[0],), compute_dtype),  # train.py:618
        )
        terms = transport.training_losses(
            model_fn,
            key,
            micro["x1"].astype(compute_dtype),
            model_kwargs=model_kwargs,
            cond=micro["cond"].astype(compute_dtype),
            img_mask=micro["img_mask"],
        )
        return terms["loss"].mean(), terms

    grad_fn = jax.grad(loss_fn, has_aux=True)

    def train_step(state: TrainState, batch: dict, key: jax.Array):
        trainable = state.lora if is_lora else state.params
        accum = batch["x1"].shape[0]
        keys = jax.random.split(key, accum)

        def scan_body(carry, inputs):
            gsum, loss_sum = carry
            micro, k = inputs
            g, terms = grad_fn(trainable, state, micro, k)
            gsum = jax.tree.map(jnp.add, gsum, g)
            return (gsum, loss_sum + terms["loss"].mean()), terms["t"]

        zero_g = jax.tree.map(lambda x: jnp.zeros(x.shape, jnp.float32), trainable)
        (gsum, loss_sum), _ = jax.lax.scan(scan_body, (zero_g, 0.0), (batch, keys))
        grads = jax.tree.map(lambda g: g / accum, gsum)
        loss = loss_sum / accum

        grad_norm = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, state.opt_state, trainable)
        new_trainable = optax.apply_updates(trainable, updates)

        ema = state.ema
        if ema is not None and ema_decay is not None:
            ema = update_ema(ema, new_trainable, ema_decay)

        new_state = TrainState(
            step=state.step + 1,
            params=state.params if is_lora else new_trainable,
            lora=new_trainable if is_lora else state.lora,
            opt_state=opt_state,
            ema=ema,
        )
        metrics = {"loss": loss, "grad_norm": grad_norm}
        return new_state, metrics

    return train_step
