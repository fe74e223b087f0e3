"""Training CLI: the full VisualCloze trainer on TPU.

Counterpart of the reference train.py (760-840 flags, 228-752 main):
GSPMD mesh instead of NCCL+FSDP wrappers, one jitted step with scanned
gradient accumulation, Orbax + reference-format LoRA checkpoints,
deterministic resumable data order.

Run (example, mirrors exps/train.sh):
  python -m visualcloze_tpu.training.train \
      --data_path configs/data/visualcloze.yaml \
      --results_dir ./results --model_name flux-dev-fill-lora \
      --global_bsz 16 --micro_bsz 2 --lr 1e-4 --grad_clip 2.0 \
      --snr_type lognorm --lora_rank 256 --grid_resolution 384 \
      --training_type lora --max_steps 50000 --fsdp 8
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import signal
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FluxConfig, configs
from ..data import (
    DataLoader,
    Graph200KItemProcessor,
    GridDataset,
    dataloader_collate_fn,
    get_train_sampler,
)
from ..data.prefix_instruction import graph200k_task_dicts
from ..models.flux import init_flux, param_count
from ..models.lora import init_lora, lora_param_count
from ..parallel import (
    create_mesh,
    initialize_distributed,
    replicate_tree,
    shard_micro_batches,
    shard_params,
)
from ..transport import create_transport
from ..utils.misc import PhaseTimer, SmoothedValue
from . import checkpoint as ckpt
from .batch import prepare_train_batch, to_micro_batches
from .step import init_train_state, make_optimizer, make_train_step, trainable_mask

logger = logging.getLogger("train")


def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="VisualCloze TPU trainer")
    # model / data (ref train.py:760-840)
    p.add_argument("--model_name", default="flux-dev-fill-lora", choices=list(configs))
    p.add_argument("--data_path", required=True)
    p.add_argument("--results_dir", default="./results")
    p.add_argument("--grid_resolution", type=int, default=384)
    p.add_argument("--cache_data_on_disk", action="store_true")
    # optimization
    p.add_argument("--max_steps", type=int, default=100_000)
    p.add_argument("--global_bsz", type=int, default=16)
    p.add_argument("--micro_bsz", type=int, default=2)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--wd", type=float, default=0.0)
    p.add_argument("--grad_clip", type=float, default=2.0)
    p.add_argument("--snr_type", default="lognorm")
    p.add_argument("--no_shift", action="store_true")
    p.add_argument("--caption_dropout_prob", type=float, default=0.1)
    p.add_argument("--training_type", default="lora",
                   choices=["lora", "full_model", "double_block", "bias", "norm"])
    p.add_argument("--lora_rank", type=int, default=128)
    p.add_argument("--moe_experts", type=int, default=0,
                   help="MoE-LoRA: number of expert LoRA pairs (0 = plain "
                        "LoRA). Expert leaves shard over the ep mesh axis.")
    p.add_argument("--ep", type=int, default=1,
                   help="expert-parallel mesh axis size (MoE-LoRA)")
    p.add_argument("--use_model_ema", action="store_true")
    p.add_argument("--ema_decay", type=float, default=0.95)
    p.add_argument("--checkpointing", action="store_true", help="activation remat")
    p.add_argument("--remat_policy", default="dots",
                   choices=["dots", "dots_split", "full"],
                   help="remat policy: dots saves matmul outputs (faster bwd), "
                        "full recomputes everything (least memory)")
    # parallelism (mesh axes replace data_parallel fsdp/sdp flags)
    p.add_argument("--dp", type=int, default=1)
    p.add_argument("--fsdp", type=int, default=0, help="0 = all remaining devices")
    p.add_argument("--sdp", action="store_true",
                   help="ZeRO-2 (ref train.py:160-163 SHARD_GRAD_OP): params "
                        "REPLICATED over the fsdp axis, gradients + optimizer "
                        "state (and EMA) sharded over it — lower comms than "
                        "--fsdp (no per-layer weight all-gather) at higher "
                        "param memory")
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--cp", type=int, default=1,
                   help="sequence/context parallelism: ring attention over a "
                        "cp mesh axis (requires seq bucket divisible by cp)")
    p.add_argument("--pp", type=int, default=1,
                   help="pipeline parallelism: GPipe microbatching of the "
                        "single-block trunk over a pp mesh axis "
                        "(parallel/pipeline.py; 38 %% pp == 0)")
    p.add_argument("--pp_microbatches", type=int, default=0,
                   help="pipeline microbatches per micro-batch (0 = pp); "
                        "micro_bsz %% pp_microbatches == 0")
    # checkpointing / resume
    p.add_argument("--ckpt_every", type=int, default=1000)
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--auto_resume", action="store_true")
    p.add_argument("--resume", default=None)
    p.add_argument("--init_from", default=None, help="consolidated LoRA .pth to start from")
    p.add_argument("--global_seed", type=int, default=0)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--init_random", action="store_true",
                   help="random base weights (no FLUX checkpoint; smoke tests)")
    p.add_argument("--tiny", action="store_true", help="tiny model (smoke tests)")
    p.add_argument("--max_seq_bucket", type=int, default=512)
    p.add_argument("--profile_dir", default=None)
    p.add_argument("--use_tensorboard", action="store_true",
                   help="log loss/grad_norm to results_dir/tb (tensorboardX)")
    p.add_argument("--use_wandb", action="store_true")
    p.add_argument("--wandb_project", default="visualcloze-tpu")
    p.add_argument("--precision", default="bf16", choices=["bf16", "fp32"],
                   help="compute dtype (bf16 on TPU; fp32 for CPU smoke tests "
                        "where bf16 is emulated)")
    p.add_argument("--prompt_bank", default="reference",
                   choices=["reference", "original"],
                   help="prompt template bank: 'reference' (default) trains "
                        "on the exact template strings of the reference / "
                        "released LoRAs; 'original' uses this repo's own bank "
                        "(fresh prompt distribution for from-scratch runs)")
    return p.parse_args(argv)


def main(argv=None) -> None:
    args = parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="[%(asctime)s %(name)s] %(message)s")
    from ..data.prefix_instruction import set_prompt_bank

    set_prompt_bank(args.prompt_bank)
    initialize_distributed()
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()

    n_dev = len(jax.devices())
    fsdp = args.fsdp or max(
        1, n_dev // (args.dp * args.tp * args.cp * args.ep * args.pp)
    )
    mesh = create_mesh(dp=args.dp, fsdp=fsdp, tp=args.tp, cp=args.cp,
                       ep=args.ep, pp=args.pp)
    logger.info("mesh: pp=%d dp=%d fsdp=%d tp=%d cp=%d ep=%d over %d devices",
                args.pp, args.dp, fsdp, args.tp, args.cp, args.ep, n_dev)

    # ----- models -----
    spec = configs[args.model_name]
    flux_cfg = spec.flux.tiny() if args.tiny else spec.flux
    from ..pipeline.loader import random_components

    if args.init_random or args.tiny:
        # interleaved: train in the reference's channel order (the real-
        # weight path below is also unpermuted), so exported LoRA
        # checkpoints drop into the serving pipeline / reference as-is
        bundle = random_components(
            jax.random.PRNGKey(args.global_seed), tiny=args.tiny,
            resolution=args.grid_resolution, rope_layout="interleaved",
        )
        flux_cfg, params = bundle.cfg, bundle.params
        ae, t5, clip = bundle.ae, bundle.t5, bundle.clip
    else:
        from ..pipeline.loader import load_ae, load_clip, load_flux_params, load_t5

        flux_cfg, params = load_flux_params(args.model_name, dtype=jnp.float32)
        ae, t5, clip = load_ae(), load_t5(), load_clip()
        # frozen encoders: FSDP-shard large weights (ref train.py:133-149)
        from ..parallel import shard_large_params

        t5.params = shard_large_params(t5.params, mesh)
        clip.params = shard_large_params(clip.params, mesh)
        ae.params = shard_large_params(ae.params, mesh)

    lora = None
    if args.training_type == "lora":
        if args.moe_experts > 0:
            from ..models.lora import init_moe_lora

            lora = init_moe_lora(
                jax.random.PRNGKey(args.global_seed + 1), params,
                args.lora_rank, num_experts=args.moe_experts,
            )
        else:
            lora = init_lora(
                jax.random.PRNGKey(args.global_seed + 1), params, args.lora_rank
            )
        if args.init_from:
            if args.moe_experts > 0:
                raise ValueError(
                    "--init_from loads a plain-LoRA .pth, which has no "
                    "MoE-expert format; it cannot be combined with "
                    "--moe_experts (the MoE tree would be silently replaced)."
                )
            lora = ckpt.load_torch_lora(args.init_from, flux_cfg)
        logger.info("LoRA params: %.1fM", lora_param_count(lora) / 1e6)
    logger.info("base params: %.2fB", param_count(params) / 1e9)

    params = shard_params(params, mesh, mode="sdp" if args.sdp else "fsdp")
    if lora is not None:
        if args.moe_experts > 0:
            lora = shard_params(lora, mesh)  # expert leaves over the ep axis
        else:
            lora = replicate_tree(lora, mesh)

    # ----- optimizer / state -----
    mask = None
    if args.training_type not in ("lora", "full_model"):
        mask = trainable_mask(params, args.training_type)
    optimizer = make_optimizer(args.lr, args.wd, args.grad_clip, mask)
    state = init_train_state(
        params, lora, optimizer, args.training_type, args.use_model_ema,
        mask=mask,
        opt_mesh=mesh if args.sdp else None,
    )

    transport = create_transport(
        "Linear", "velocity", snr_type=args.snr_type, do_shift=not args.no_shift
    )
    compute_dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    attn_impl = "auto"
    if args.cp > 1 and args.pp > 1:
        # ring attention is itself a shard_map; nesting it inside the
        # pipeline's shard_map body (manual mesh) fails at trace time
        raise SystemExit("--cp and --pp cannot be combined: ring attention "
                         "runs inside its own shard_map and cannot nest "
                         "inside the pipeline's (pick one; fsdp/tp/dp "
                         "compose with either)")
    if args.pp > 1 and args.remat_policy == "dots_split":
        raise SystemExit("--remat_policy dots_split is not implemented for "
                         "the pipelined trunk; use dots or full with --pp")
    if args.cp > 1:
        from ..ops.attention import RingSpec

        # ring attention over the cp axis; "auto" picks the fused Pallas
        # chunk kernels on TPU, xla elsewhere — both trainable through the
        # fused ring backward (ops/ring_attention.py)
        attn_impl = RingSpec(mesh=mesh, axis="cp", chunk_impl="auto")
    # ZeRO-2 must PIN the output state to the input placements: without
    # out_shardings, XLA propagates the sharded optimizer moments into the
    # updated params, silently converting --sdp into --fsdp after step 1
    out_sh = None
    if args.sdp:
        from jax.sharding import NamedSharding, PartitionSpec as PSpec

        def _pin(x):  # scalars (state.step) carry single-device shardings
            s = getattr(x, "sharding", None)
            return s if isinstance(s, NamedSharding) else NamedSharding(mesh, PSpec())

        out_sh = (jax.tree.map(_pin, state), None)  # metrics: auto
    train_step = jax.jit(
        make_train_step(
            flux_cfg, transport, optimizer, args.training_type,
            ema_decay=args.ema_decay if args.use_model_ema else None,
            remat=args.checkpointing,
            remat_policy=None if args.remat_policy == "full" else args.remat_policy,
            compute_dtype=compute_dtype,
            attn_impl=attn_impl,
            mesh=mesh if args.pp > 1 else None,
            pp_microbatches=args.pp_microbatches or None,
        ),
        donate_argnums=(0,),
        out_shardings=out_sh,
    )

    # ----- resume -----
    ckpt_root = os.path.join(args.results_dir, "checkpoints")
    resume_step = 0
    resume_dir = args.resume
    if args.auto_resume and resume_dir is None:
        resume_dir = ckpt.find_latest_checkpoint(ckpt_root)
    if resume_dir:
        logger.info("resuming from %s", resume_dir)
        # abstract template: shapes/dtypes only — never gathers the freshly
        # initialized (possibly multi-host-sharded) state onto one host
        template = jax.tree.map(
            lambda l: jax.ShapeDtypeStruct(jnp.shape(l), l.dtype),
            {"params": state.params, "lora": state.lora,
             "opt_state": state.opt_state, "ema": state.ema, "step": state.step},
        )
        restored = ckpt.load_checkpoint(resume_dir, abstract_state=template)
        # reshard-on-restore: leaves go back onto the CURRENT mesh's shardings
        state = ckpt.restore_into(state, restored)
        resume_step = ckpt.load_resume_step(resume_dir)

    # ----- data -----
    process_index = jax.process_index()
    world = jax.process_count()
    dataset = GridDataset(
        args.data_path,
        Graph200KItemProcessor(resolution=args.grid_resolution),
        cache_on_disk=args.cache_data_on_disk,
        task_dicts={"image_grid_graph200k": graph200k_task_dicts},
        process_index=process_index,
        seed=args.global_seed,
    )
    # micro_bsz is PER data-parallel rank (reference FSDP semantics,
    # train.py:606-636): one accumulation step feeds micro_bsz x n_data
    # samples across the (dp, fsdp) axes.
    n_data = mesh.shape["dp"] * mesh.shape["fsdp"]
    global_micro = args.micro_bsz * n_data
    if args.global_bsz % global_micro != 0:
        raise SystemExit(
            f"--global_bsz {args.global_bsz} must be a multiple of micro_bsz x "
            f"dp x fsdp = {args.micro_bsz} x {n_data} = {global_micro}"
        )
    accum = args.global_bsz // global_micro
    if args.global_bsz % world != 0:
        raise SystemExit(
            f"--global_bsz {args.global_bsz} must be a multiple of the process "
            f"count {world}: each host loads global_bsz/world samples, and a "
            "floored split would silently shrink the batch AND desynchronize "
            "the sampler's resume offset from what the loader consumed"
        )
    local_bsz = args.global_bsz // world  # samples this host loads per step
    if local_bsz % accum != 0:
        raise SystemExit(
            f"host count {world} must divide the global micro batch "
            f"{global_micro} (per-host {local_bsz} samples cannot split into "
            f"{accum} accumulation slices)"
        )
    sampler = get_train_sampler(
        len(dataset), process_index, world, args.global_bsz,
        args.max_steps, resume_step, args.global_seed,
    )
    loader = DataLoader(
        dataset, sampler, local_bsz, dataloader_collate_fn, num_workers=args.num_workers
    )
    loader_iter = iter(loader)

    # ----- loggers (ref train.py:252-269, 640-650) -----
    tb_writer = None
    if args.use_tensorboard:
        from tensorboardX import SummaryWriter

        tb_writer = SummaryWriter(os.path.join(args.results_dir, "tb"))
    wandb_run = None
    if args.use_wandb:
        try:
            import wandb

            wandb_run = wandb.init(project=args.wandb_project, config=vars(args))
        except Exception as e:  # wandb optional / offline
            logger.warning("wandb unavailable (%s); continuing without it", e)

    # ----- loop (ref train.py:544-677) -----
    os.makedirs(ckpt_root, exist_ok=True)
    # All host/device randomness is derived per step from (seed, host, step)
    # below, never advanced sequentially: a resumed run at step k draws
    # exactly what the uninterrupted run drew at step k (sequential streams
    # would replay the from-start sequence after --auto_resume, correlating
    # post-resume mask/caption/t/noise draws with early training).
    base_key = jax.random.PRNGKey(args.global_seed + 1000 + process_index)
    timer = PhaseTimer()
    loss_meter = SmoothedValue()
    logger.info("training for %d steps from %d", args.max_steps, resume_step)

    # Preemption-safe checkpointing (beyond the reference, SURVEY §5.3 —
    # it only has auto_resume): preemptible TPU slices deliver SIGTERM with
    # a grace window. The handler only flips a flag; the loop finishes the
    # in-flight step, saves a checkpoint at the NEXT step boundary (the
    # deterministic sampler replays data order from there), and exits 0 so
    # the scheduler restarts with --auto_resume picking it up.
    preempted = {"flag": False}

    def _on_preempt(signum, frame):
        del frame
        preempted["flag"] = True
        logger.warning("signal %d: checkpoint at next step boundary", signum)

    if threading.current_thread() is threading.main_thread():
        signal.signal(signal.SIGTERM, _on_preempt)

    def agreed_preempt() -> bool:
        """SIGTERM lands per host; the checkpoint save below is a collective.
        Hosts that disagree (signal skew around the step boundary) would split
        between save_checkpoint's collectives and the next train_step's and
        deadlock until the grace window kills the slice — so the flag is
        max-reduced across processes before branching."""
        if world == 1:
            return preempted["flag"]
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.asarray(preempted["flag"], np.int32)
        )
        return bool(np.max(flags))

    for step in range(resume_step, args.max_steps):
        timer.reset()
        _, rows_batch, prompts, _, grid_shapes = next(loader_iter)
        timer.mark("DataloadSecs")

        rng = np.random.default_rng((args.global_seed, process_index, step))
        bk, sk = jax.random.split(jax.random.fold_in(base_key, step))
        batch = prepare_train_batch(
            ae, t5, clip, rows_batch, prompts, grid_shapes, bk, rng,
            caption_dropout=args.caption_dropout_prob, bucket=args.max_seq_bucket,
            compute_dtype=compute_dtype,
        )
        batch = to_micro_batches(batch, local_bsz // accum)
        batch = shard_micro_batches(batch, mesh)  # split batch over (dp, fsdp)
        timer.mark("EncodeSecs")

        state, metrics = train_step(state, batch, sk)
        if step % args.log_every == 0:
            loss = float(jax.device_get(metrics["loss"]))
            gn = float(jax.device_get(metrics["grad_norm"]))
            timer.mark("TrainSecs")
            loss_meter.update(loss)
            logger.info(
                "step %d loss %.4f (%s) grad_norm %.3f %s",
                step, loss, loss_meter, gn, timer.summary(),
            )
            if tb_writer is not None:
                tb_writer.add_scalar("loss", loss, step)
                tb_writer.add_scalar("grad_norm", gn, step)
                tb_writer.add_scalar("lr", args.lr, step)
            if wandb_run is not None:
                wandb_run.log({"loss": loss, "grad_norm": gn, "lr": args.lr}, step=step)

        stop = agreed_preempt()
        if (
            (step + 1) % args.ckpt_every == 0
            or step + 1 == args.max_steps
            or stop
        ):
            path = ckpt.save_checkpoint(
                ckpt_root, step + 1, state, flux_cfg,
                model_args=vars(args), save_ema=args.use_model_ema,
            )
            logger.info("saved checkpoint %s", path)
        if stop:
            logger.warning("preempted at step %d: checkpoint saved, exiting "
                           "cleanly for --auto_resume restart", step + 1)
            break

    if tb_writer is not None:
        tb_writer.close()
    logger.info("done")


if __name__ == "__main__":
    main()
