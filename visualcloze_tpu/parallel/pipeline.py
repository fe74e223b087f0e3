"""Pipeline parallelism (`pp` mesh axis): GPipe microbatch pipelining of the
FLUX single-block trunk via `shard_map` + `ppermute`.

The reference has NO pipeline parallelism (SURVEY.md §2.9: "Not present:
... pipeline parallelism") — this is a beyond-parity capability, aimed at
the topology the other axes cannot serve: scaling ACROSS slices, where
fsdp/tp collectives would ride slow DCN links every layer. Pipelining moves
only microbatch activations across the `pp` boundary — one (mb, L, H)
tensor per stage per tick — so the per-step DCN traffic is orders of
magnitude below an fsdp all-gather schedule.

Why the single trunk (and not the whole model):
  - FLUX is two unequal stacks: 19 DoubleStreamBlocks + 38
    SingleStreamBlocks. 19 is prime, so uniform whole-model stages do not
    exist for any useful pp, and per the device trace (docs/PROFILE.md) a
    double block costs the same per-block time as a single block — i.e. the
    single trunk is 2/3 of step compute and is uniform (38 = 2 x 19 divides
    by pp = 2 or 19).
  - The embedders + double stack run data-parallel ACROSS pp ranks (pp acts
    as an extra batch axis there via GSPMD — zero bubble, zero waste), then
    the concat(txt, img) stream flows through the pipelined trunk.

Schedule: classic GPipe over M microbatches (M % pp == 0): T = M + pp - 1
ticks; stage s processes microbatch (t - s) at tick t; activations hop
s -> s+1 by `ppermute` each tick. Bubble fraction (pp-1)/T in each of
forward and backward — jax.grad differentiates the tick scan, so the
backward is automatically the reverse pipeline. Inactive ticks compute on
zeros and are `where`-masked; their cotangents are zero by the same mask.

Memory notes (documented tradeoffs):
  - inputs and side inputs (vec, RoPE tables, mask) are all-gathered over
    pp inside the shard_map body so stage 0 can feed any microbatch and
    every stage can index its side inputs — ~2 x the trunk activation
    footprint per device at M microbatches.
  - pp shards the single-trunk parameters stage-wise (axis 0 of the
    stacked leaves) AND keeps the fsdp/tp dims of flux_param_spec sharded
    within each stage: the shard_map in_specs are the real global specs,
    and each block's weights are all-gathered just-in-time inside the
    stage scan (manual FSDP — the backward's reduce-scatter is the
    transpose of the tiled all_gather). Per-device trunk parameter
    memory is therefore size / (pp * fsdp * tp), at the cost of
    re-gathering per microbatch tick — the same per-use gather schedule
    GSPMD emits for FSDP under gradient accumulation.
  - tp inside the trunk contributes parameter-memory sharding only (the
    microbatch compute is replicated across tp ranks; batch rides
    (dp, fsdp)). The doubles/embedders phase is plain GSPMD where tp is
    the usual megatron compute axis.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import FluxConfig
from ..models import layers
from ..models.flux import embed_inputs
from .sharding import flux_param_spec

Params = dict[str, Any]


def _batch_axes(mesh: Mesh) -> tuple[str, ...]:
    """Mesh axes that carry the microbatch's batch dim inside the trunk
    (pure data axes there; pp is the stage axis)."""
    return tuple(
        a for a in ("dp", "fsdp") if a in mesh.axis_names and mesh.shape[a] > 1
    )


def _trunk_specs(tree: Params | None, mesh: Mesh) -> Params | None:
    """Global PartitionSpecs for the stacked single-trunk leaves (params or
    LoRA): flux_param_spec under the 'single_blocks' path prefix — pp on the
    stacked depth axis plus the usual fsdp/tp weight-dim sharding."""
    if tree is None:
        return None
    prefix = (jax.tree_util.DictKey("single_blocks"),)
    return jax.tree_util.tree_map_with_path(
        lambda kp, leaf: flux_param_spec(prefix + tuple(kp), leaf, mesh), tree
    )


def _gather_block(tree: Params | None, specs: Params | None):
    """Inside the shard_map body: reconstruct one block's full weights from
    their per-device shards. `specs` are the STACKED-leaf specs; the block
    leaf has lost axis 0 (the depth/pp axis), so spec entry d applies to
    block dim d-1. The transpose of each tiled all_gather is a
    psum_scatter — the backward emits the FSDP reduce-scatter for free."""
    if tree is None:
        return None

    def g(leaf, spec):
        for dim, names in enumerate(spec):
            if dim == 0 or names is None:
                continue
            for ax in names if isinstance(names, tuple) else (names,):
                if ax == "pp":
                    continue
                leaf = jax.lax.all_gather(leaf, ax, axis=dim - 1, tiled=True)
        return leaf

    flat, treedef = jax.tree.flatten(tree)
    flat_s = jax.tree.leaves(specs, is_leaf=lambda x: isinstance(x, P))
    return jax.tree.unflatten(treedef, [g(l, s) for l, s in zip(flat, flat_s)])


def pipeline_single_trunk(
    cfg: FluxConfig,
    mesh: Mesh,
    sparams: Params,
    slora: Params | None,
    x: jnp.ndarray,
    vec: jnp.ndarray,
    pe: tuple[jnp.ndarray, jnp.ndarray],
    attn_mask: jnp.ndarray | None,
    *,
    microbatches: int,
    lora_scale=1.0,
    attn_impl: str = "auto",
    remat: bool = False,
    remat_policy: str | None = "dots",
    rope_layout: str = "interleaved",
) -> jnp.ndarray:
    """Run the single-block stack as a GPipe pipeline over the pp mesh axis.

    Args:
      sparams/slora: stacked single-block params (depth_s, ...) (+ LoRA).
      x: (B, L, H) concat(txt, img) stream; B % microbatches == 0.
      vec/pe/attn_mask: the per-sample side inputs from embed_inputs.
    Returns (B, L, H), identical to the sequential scan.
    """
    pp = mesh.shape["pp"]
    depth_s = jax.tree.leaves(sparams)[0].shape[0]
    M = microbatches
    B = x.shape[0]
    if pp <= 1:
        raise ValueError("pipeline_single_trunk needs a pp>1 mesh axis")
    if not isinstance(attn_impl, str):
        raise ValueError(
            "pipeline parallelism cannot nest a RingSpec (cp ring attention "
            "is its own shard_map) — use a string attn_impl inside the trunk"
        )
    if remat and remat_policy == "dots_split":
        raise ValueError(
            "remat_policy='dots_split' (two-segment seg remat) is not "
            "implemented for the pipelined trunk — use 'dots' or full with "
            "--pp (the non-pp path supports dots_split)"
        )
    if depth_s % pp:
        raise ValueError(f"depth_single_blocks={depth_s} not divisible by pp={pp}")
    if B % M or M % pp:
        raise ValueError(f"need B({B}) % M({M}) == 0 and M % pp({pp}) == 0")
    mb = B // M
    n_data = 1
    for a in _batch_axes(mesh):
        n_data *= mesh.shape[a]
    if mb % n_data:
        raise ValueError(
            f"microbatch size {mb} (B={B}/M={M}) not divisible by the "
            f"data-axes product {n_data} (dp*fsdp)"
        )
    cos, sin = pe
    has_mask = attn_mask is not None

    # (B, ...) -> (M, mb, ...) microbatch views
    xm = x.reshape(M, mb, *x.shape[1:])
    vecm = vec.reshape(M, mb, *vec.shape[1:])
    cosm = cos.reshape(M, mb, *cos.shape[1:])
    sinm = sin.reshape(M, mb, *sin.shape[1:])
    maskm = attn_mask.reshape(M, mb, -1) if has_mask else None

    baxes = _batch_axes(mesh)
    bspec = baxes if baxes else None
    data_spec = P("pp", bspec)  # microbatches over pp, batch over data axes
    param_specs = _trunk_specs(sparams, mesh)
    lora_specs = _trunk_specs(slora, mesh)

    perm = [(i, (i + 1) % pp) for i in range(pp)]

    def body(sp, sl, xl, vecl, cosl, sinl, maskl):
        s = jax.lax.axis_index("pp")
        # stage 0 feeds any microbatch; every stage indexes its per-mb side
        # inputs by (t - s) — gather the microbatch axis once up front.
        ag = lambda a: jax.lax.all_gather(a, "pp", axis=0, tiled=True)  # noqa: E731
        xs_all, vec_all, cos_all, sin_all = ag(xl), ag(vecl), ag(cosl), ag(sinl)
        mask_all = ag(maskl) if has_mask else None

        def stage(x, vec_mb, cos_mb, sin_mb, mask_mb):
            def blk(x, xs):
                bp, bl = xs
                # just-in-time FSDP gather of this block's weight shards
                bp = _gather_block(bp, param_specs)
                bl = _gather_block(bl, lora_specs)
                x = layers.single_block(
                    cfg, bp, x, vec_mb, (cos_mb, sin_mb), mask_mb,
                    bl, lora_scale, attn_impl, rope_layout,
                )
                return x, None

            b = blk
            if remat:
                policy = (
                    jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                    if remat_policy == "dots" else None
                )
                b = jax.checkpoint(b, policy=policy)
            x, _ = jax.lax.scan(b, x, (sp, sl))
            return x

        T = M + pp - 1

        def tick(carry, t):
            recv, outbuf = carry
            mbi = t - s
            act = (mbi >= 0) & (mbi < M)
            mbc = jnp.clip(mbi, 0, M - 1)
            g = lambda a: jax.lax.dynamic_index_in_dim(  # noqa: E731
                a, mbc, 0, keepdims=False
            )
            feed = jax.lax.dynamic_index_in_dim(
                xs_all, jnp.clip(t, 0, M - 1), 0, keepdims=False
            )
            x_in = jnp.where(s == 0, feed, recv)
            y = stage(
                x_in, g(vec_all), g(cos_all), g(sin_all),
                g(mask_all) if has_mask else None,
            )
            y = jnp.where(act, y, jnp.zeros_like(y))
            prev = jax.lax.dynamic_index_in_dim(outbuf, mbc, 0, keepdims=False)
            wr = jnp.where((s == pp - 1) & act, y, prev)
            outbuf = jax.lax.dynamic_update_index_in_dim(outbuf, wr, mbc, 0)
            send = jax.lax.ppermute(y, "pp", perm)
            return (send, outbuf), None

        carry0 = (jnp.zeros_like(xs_all[0]), jnp.zeros_like(xs_all))
        (_, outbuf), _ = jax.lax.scan(tick, carry0, jnp.arange(T))
        # only the last stage wrote non-zeros; one psum redistributes
        outbuf = jax.lax.psum(outbuf, "pp")
        m_loc = M // pp
        return jax.lax.dynamic_slice_in_dim(outbuf, s * m_loc, m_loc, 0)

    in_specs = [param_specs, lora_specs, data_spec, data_spec, data_spec, data_spec]
    args = [sparams, slora, xm, vecm, cosm, sinm]
    if has_mask:
        in_specs.append(data_spec)
        args.append(maskm)
        fn = jax.shard_map(
            lambda sp, sl, a, b, c, d, e: body(sp, sl, a, b, c, d, e),
            mesh=mesh, in_specs=tuple(in_specs), out_specs=data_spec,
            check_vma=False,
        )
    else:
        fn = jax.shard_map(
            lambda sp, sl, a, b, c, d: body(sp, sl, a, b, c, d, None),
            mesh=mesh, in_specs=tuple(in_specs), out_specs=data_spec,
            check_vma=False,
        )
    out = fn(*args)
    return out.reshape(B, *x.shape[1:])


def flux_apply_pp(
    cfg: FluxConfig,
    params: Params,
    mesh: Mesh,
    *,
    microbatches: int,
    img: jnp.ndarray,
    img_ids: jnp.ndarray,
    txt: jnp.ndarray,
    txt_ids: jnp.ndarray,
    timesteps: jnp.ndarray,
    y: jnp.ndarray,
    txt_mask: jnp.ndarray | None = None,
    img_mask: jnp.ndarray | None = None,
    guidance: jnp.ndarray | None = None,
    lora: Params | None = None,
    lora_scale=1.0,
    attn_impl: str = "auto",
    remat: bool = False,
    remat_policy: str | None = "dots",
    rope_layout: str = "interleaved",
) -> jnp.ndarray:
    """flux_apply with the single trunk pipelined over the pp mesh axis.

    Same contract as models/flux.flux_apply (ref models/model.py:85-124);
    the embedders + double stack run under plain GSPMD with pp as an extra
    data axis, then pipeline_single_trunk takes the concat stream. Output is
    bit-comparable to flux_apply up to reduction order (tests assert
    allclose at fp32)."""
    l = lora or {}
    img_e, txt_e, vec, pe, attn_mask = embed_inputs(
        cfg, params, l, img, img_ids, txt, txt_ids, timesteps, y,
        txt_mask, img_mask, guidance, lora_scale,
    )
    txt_len = txt_e.shape[1]

    def dbody(carry, xs):
        bp, bl = xs
        i, t = carry
        i, t = layers.double_block(
            cfg, bp, i, t, vec, pe, attn_mask, bl, lora_scale, attn_impl,
            rope_layout,
        )
        return (i, t), None

    if remat:
        policy = (
            jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            if remat_policy == "dots" else None
        )
        dbody = jax.checkpoint(dbody, policy=policy)

    # Each section gated on its own key: partial-coverage adapters are legal.
    d_lora = l.get("double_blocks")
    s_lora = l.get("single_blocks")
    (img_e, txt_e), _ = jax.lax.scan(
        dbody, (img_e, txt_e), (params["double_blocks"], d_lora)
    )

    x = jnp.concatenate([txt_e, img_e], axis=1)
    x = pipeline_single_trunk(
        cfg, mesh, params["single_blocks"], s_lora, x, vec, pe, attn_mask,
        microbatches=microbatches, lora_scale=lora_scale, attn_impl=attn_impl,
        remat=remat, remat_policy=remat_policy, rope_layout=rope_layout,
    )
    img_out = x[:, txt_len:]
    return layers.last_layer(
        params["final_layer"], img_out, vec, l.get("final_layer"), lora_scale
    )
