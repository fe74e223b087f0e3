"""visualcloze_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for universal
image generation via visual in-context learning.

Re-designed from scratch for TPU with the capabilities of lzyhha/VisualCloze:
grid-layout conditioning, a FLUX-style double/single-stream rectified-flow DiT
with LoRA, VAE + T5/CLIP conditioning, a jit-compiled Euler flow sampler,
SDEdit upsampling, GSPMD sharding (dp/fsdp/tp mesh) and a Graph200K training
stack.

Layer map (TPU-native counterpart of the reference's, see SURVEY.md §1):
  pipeline/   — VisualClozeModel orchestration (ref: visualcloze.py)
  transport/  — rectified-flow paths, losses, samplers (ref: transport/)
  models/     — Flux DiT, VAE, T5/CLIP encoders, LoRA (ref: models/)
  ops/        — RoPE, packing, schedules, Pallas flash-attention (ref: models/math.py)
  parallel/   — mesh + sharding rules (ref: util/parallel.py, FSDP)
  data/       — Graph200K dataset, task registry, degradations (ref: data/)
  training/   — train step, EMA, checkpointing (ref: train.py)
"""

__version__ = "0.1.0"
