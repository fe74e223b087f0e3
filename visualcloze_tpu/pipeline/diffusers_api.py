"""Diffusers-compatible convenience API.

The reference's third user surface (README "Custom Sampling with Diffusers",
merged into diffusers as `VisualClozePipeline`) drives the model with

    pipe = VisualClozePipeline.from_pretrained(snapshot, resolution=384, ...)
    out = pipe(task_prompt=..., content_prompt=..., image=[[a, b], [c, None]],
               upsampling_height=1632, upsampling_width=1232,
               upsampling_strength=0.3, guidance_scale=30,
               num_inference_steps=30, seed=0)
    out.images[0][0].save("result.png")

This module provides the same call shape over `VisualClozeModel` so a
diffusers user switches with near-zero code change. Mapping notes:

- `image` is a list of grid rows; `None` marks the masked query cells;
  entries may be PIL images, numpy arrays, or file paths/Path objects.
- the layout prompt is auto-generated from the grid shape (reference bank
  template, same text the reference pipelines produce) unless
  `layout_prompt` is given explicitly.
- `upsampling_strength` keeps diffusers' img2img convention — the fraction
  of the schedule re-run on the resized image (1.0 = regenerate fully,
  conditioned on the stage-1 result; 0.0 = no denoise, return the plain
  resize). The reference repo's native knob is the *latent* mix weight
  `upsampling_noise` (x = noise*(1-un) + latent*un, ref visualcloze.py:221,
  where un >= 1.0 degenerates to a plain resize, ref :181-182); the two are
  inverses: `upsampling_noise = 1 - upsampling_strength`. The facade maps
  accordingly, so the model card's `upsampling_strength=0.3` gives the same
  light SDEdit refinement here as in diffusers. The upsampling pass always
  runs (to `upsampling_height/width` if given, else the query cell's native
  size), like diffusers' combined pipeline; the default strength matches
  diffusers (1.0). `upsampling_steps` keeps the reference repo's grid-count
  semantics (default 10 -> 9 integrator steps).
- `generator`: anything with `initial_seed()` (torch.Generator) or an int
  seed; `seed=` is the native spelling.
- batch size is 1 (the reference serves B=1 grids); `.images` still nests
  one level for `.images[0][cell]` compatibility.
"""

from __future__ import annotations

import dataclasses
import random
from pathlib import Path
from typing import Any, Sequence

import numpy as np
from PIL import Image


@dataclasses.dataclass
class VisualClozePipelineOutput:
    """`.images[batch][cell]` like diffusers' pipeline output."""

    images: list[list[Image.Image]]


def _as_image(cell: Any) -> Image.Image | None:
    """diffusers' load_image always yields RGB — convert uniformly so RGBA/
    grayscale PIL cells and (H,W)/(H,W,4) arrays don't reach preprocessing
    with the wrong band count."""
    if cell is None:
        return None
    if isinstance(cell, Image.Image):
        return cell.convert("RGB")
    if isinstance(cell, (str, Path)):
        return Image.open(cell).convert("RGB")
    if isinstance(cell, np.ndarray):
        return Image.fromarray(cell).convert("RGB")
    raise TypeError(f"unsupported image cell type {type(cell).__name__}")


def default_layout_prompt(rows: int, cols: int) -> str:
    """Deterministic auto layout prompt (first reference-bank template —
    the same string the reference's pipelines render for a grid)."""
    from ..data.prefix_instruction import get_layout_instruction

    return get_layout_instruction(cols, rows, rng=random.Random(0), bank="reference")


class VisualClozePipeline:
    """Thin diffusers-shaped facade over `VisualClozeModel`."""

    def __init__(self, model):
        self.model = model

    # ------------------------- construction -------------------------

    @classmethod
    def from_pretrained(
        cls,
        pretrained_path: str | Path | None = None,
        *,
        resolution: int = 384,
        mesh=None,
        **model_kwargs,
    ) -> "VisualClozePipeline":
        """Build from a local checkpoint/snapshot directory.

        Accepts the same sources as `pipeline.loader.build_visualcloze`: a
        diffusers `VisualClozePipeline-384/-512` snapshot dir, a reference
        `.pth` / peft-LoRA checkpoint (with FLUX_DEV_FILL/AE/T5_PATH/
        CLIP_PATH env vars for the base weights), or a BFL safetensors set.
        No hub download — paths must be local (docs/INSTALL.md)."""
        from .loader import build_visualcloze

        model = build_visualcloze(
            model_path=str(pretrained_path) if pretrained_path is not None else None,
            resolution=resolution,
            mesh=mesh,
            **model_kwargs,
        )
        return cls(model)

    def load_lora_weights(
        self,
        path: str | Path,
        weight_name: str | None = None,
        adapter_name: str | None = None,
    ) -> "VisualClozePipeline":
        """Diffusers-style LoRA attach. With `adapter_name` the LoRA becomes
        a named runtime adapter (pass `adapter=` at call time); without it
        the LoRA is folded into the weights like diffusers'
        `load_lora_weights` + `fuse_lora`. Reads reference-trainer `.pth`
        and diffusers/peft safetensors (loader.convert_lora_any)."""
        from ..models.lora import fold_lora
        from .loader import convert_lora_any, load_torch_checkpoint

        path = Path(path)
        if weight_name is not None:
            path = path / weight_name
        lora = convert_lora_any(load_torch_checkpoint(str(path)), self.model.cfg)
        if adapter_name is not None:
            self.model.add_adapter(adapter_name, lora)
        else:
            if self.model.rope_layout == "half":
                from ..models.weights import permute_rope_layout_lora

                lora = permute_rope_layout_lora(lora, self.model.cfg)
            self.model.params = fold_lora(
                self.model.params, lora, scale=self.model.lora_scale
            )
        return self

    def to(self, device=None):  # noqa: D401 - parity shim
        """No-op: JAX placement is controlled by the mesh/backend."""
        return self

    # ------------------------- inference -------------------------

    def __call__(
        self,
        task_prompt: str | Sequence[str],
        content_prompt: str | Sequence[str] | None = None,
        image: Sequence[Sequence[Any]] | None = None,
        layout_prompt: str | None = None,
        upsampling_width: int | None = None,
        upsampling_height: int | None = None,
        upsampling_strength: float = 1.0,
        upsampling_steps: int = 10,
        guidance_scale: float = 30.0,
        num_inference_steps: int = 30,
        max_sequence_length: int | None = None,
        seed: int = 0,
        generator=None,
        adapter: str | None = None,
    ) -> VisualClozePipelineOutput:
        if image is None:
            raise ValueError("`image` (the grid rows, None = query cells) is required")
        # diffusers accepts per-batch prompt lists; this serves B=1
        if not isinstance(task_prompt, str):
            (task_prompt,) = task_prompt
        if content_prompt is not None and not isinstance(content_prompt, str):
            (content_prompt,) = content_prompt
        if max_sequence_length is not None and max_sequence_length != self.model.max_length:
            raise ValueError(
                f"max_sequence_length={max_sequence_length} differs from the "
                f"loaded text-encoder length {self.model.max_length}; set it "
                "at from_pretrained/load time (a per-call change would "
                "retrace the compiled text encoders)"
            )
        if generator is not None:
            if hasattr(generator, "initial_seed"):
                seed = int(generator.initial_seed()) % (2 ** 31 - 1)
            elif isinstance(generator, int):
                seed = generator
            else:
                raise TypeError(
                    "generator must be an int seed or expose initial_seed()"
                )

        grid = [[_as_image(c) for c in row] for row in image]
        rows, cols = len(grid), len(grid[0])
        if any(len(r) != cols for r in grid):
            raise ValueError("all grid rows must have the same length")
        prompts = [
            layout_prompt or default_layout_prompt(rows, cols),
            task_prompt,
            content_prompt or "",
        ]

        m = self.model
        q = m.prepare_query(
            grid, prompts, seed=seed, cfg=guidance_scale,
            steps=num_inference_steps, grid_size=(rows, cols), adapter=adapter,
        )
        if upsampling_width is not None or upsampling_height is not None:
            if upsampling_width is None or upsampling_height is None:
                raise ValueError("pass both upsampling_width and upsampling_height")
            q["upsampling_size"] = (upsampling_width, upsampling_height)  # PIL (w, h)
        if not 0.0 <= upsampling_strength <= 1.0:
            raise ValueError("upsampling_strength must be in [0, 1]")
        samples = m.denoise_query(q)
        # diffusers strength -> reference-repo noise mix: un = 1 - s, so
        # s=0.3 is a light refinement and s=0 is the plain resize (the
        # un >= 1.0 path), dims still honored. The pass always runs, like
        # diffusers' combined pipeline.
        cells = m.finalize_query(
            q, samples,
            upsampling_steps=upsampling_steps,
            upsampling_noise=1.0 - upsampling_strength,
            is_upsampling=True,
        )
        return VisualClozePipelineOutput(images=[cells])
