"""Example-gallery machinery for the demo UI.

Counterpart of the reference's examples/gradio_tasks*.py: a shared path
convention (`generate_paths_from_id`, ref gradio_tasks.py:8-36), per-family
example registries, and `process_*_tasks` hooks returning the demo output
signature (ref gradio_tasks.py:108-190).

Assets resolve under $EXAMPLES_ROOT (default ./examples/assets); families
with missing assets yield empty galleries instead of failing, so the demo
runs without the asset pack.
"""

from __future__ import annotations

import os
import random
from dataclasses import dataclass, field

from visualcloze_tpu.data.prefix_instruction import (
    get_content_instruction,
    get_image_prompt,
    get_layout_instruction,
    get_task_instruction,
)

EXAMPLES_ROOT = os.environ.get("EXAMPLES_ROOT", os.path.join(os.path.dirname(__file__), "assets"))


def asset_path(file_id: str, image_type: str) -> str:
    """Path convention: <EXAMPLES_ROOT>/<id>_<type>.jpg — ANY image type
    (conditions, degradations, editing variants) resolves uniformly."""
    return os.path.join(EXAMPLES_ROOT, f"{file_id}_{image_type}.jpg")


_KNOWN_TYPES = (
    "target", "canny", "depth", "hed", "normal", "mlsd", "openpose",
    "sam2_mask", "uniformer", "foreground", "background", "mask",
    "reference", "style_source", "style_target",
)


class _AssetPaths(dict):
    """dict of modality -> path that also resolves unknown image types (e.g.
    degradation names, DepthEdit) through the same naming convention.

    get() is existence-checked: it returns the conventional path only when
    the file is actually on disk, else the caller's default — so galleries
    degrade to empty/None cells instead of fabricating dead paths."""

    def __init__(self, file_id: str, prompt: str):
        super().__init__({t: asset_path(file_id, t) for t in _KNOWN_TYPES})
        self["prompt"] = prompt
        self._file_id = file_id

    def get(self, key, default=None):  # noqa: A003 - dict API
        if key == "prompt":
            return super().get(key, default)
        path = super().get(key) or asset_path(self._file_id, key)
        return path if os.path.exists(path) else default


def generate_paths_from_id(file_id: str, prompt: str) -> dict[str, str]:
    """One asset id maps to every condition modality
    (ref examples/gradio_tasks.py:8-36)."""
    return _AssetPaths(file_id, prompt)


@dataclass
class TaskExample:
    name: str
    image_type_list: list[str]
    file_ids: list[str]
    prompts: list[str]
    mask_count: int = 1

    def rows(self, context_num: int = 1) -> list[list[str | None]]:
        """Grid of asset paths; the final row's last `mask_count` cells are
        None (masked)."""
        grid: list[list[str | None]] = []
        for i, fid in enumerate(self.file_ids[: context_num + 1]):
            paths = generate_paths_from_id(fid, self.prompts[min(i, len(self.prompts) - 1)])
            row: list[str | None] = [paths.get(t) for t in self.image_type_list]
            grid.append(row)
        for j in range(1, self.mask_count + 1):
            grid[-1][-j] = None
        return grid


task_families: dict[str, list[TaskExample]] = {}
_FAMILY_DEFS: dict[str, list[TaskExample]] = {}


def _available(examples: list[TaskExample]) -> list[TaskExample]:
    """Keep only examples whose EVERY non-masked grid cell exists on disk
    (a partially-written asset pack must not surface dead gallery entries).
    rows() yields None for the masked tail cells and — via the
    existence-checked get() — for any missing asset file."""
    out = []
    for ex in examples:
        cells = [c for row in ex.rows(context_num=1) for c in row]
        if all(c is not None for c in cells[: len(cells) - ex.mask_count]):
            out.append(ex)
    return out


def register_task_family(family: str, examples: list[TaskExample]) -> None:
    _FAMILY_DEFS[family] = examples
    task_families[family] = _available(examples)


def refresh_task_families() -> dict[str, list[TaskExample]]:
    """Re-filter every family against the assets currently on disk (call
    after examples.make_assets writes the pack)."""
    for family, examples in _FAMILY_DEFS.items():
        task_families[family] = _available(examples)
    return task_families


def dense_prediction_tasks() -> list[TaskExample]:
    return [
        TaskExample(
            name=f"image to {cond}",
            image_type_list=["target", cond],
            file_ids=["dense_0", "dense_1"],
            prompts=["a photo", "a photo"],
        )
        for cond in ("canny", "depth", "openpose", "uniformer")
    ]


def conditional_generation_tasks() -> list[TaskExample]:
    return [
        TaskExample(
            name=f"{cond} to image",
            image_type_list=[cond, "target"],
            file_ids=["cond_0", "cond_1"],
            prompts=["a photo", "a photo"],
        )
        for cond in ("canny", "depth", "mlsd", "normal")
    ]


register_task_family("dense_prediction", dense_prediction_tasks())
register_task_family("conditional_generation", conditional_generation_tasks())


def process_tasks(example: TaskExample, context_num: int = 1):
    """Build the demo output signature (ref gradio_tasks.py:343-374):
    [mask_count, grid_h, grid_w, layout, task, content, upsampling_noise,
    steps, *image_paths]."""
    grid = example.rows(context_num)
    grid_h, grid_w = len(grid), len(grid[0])
    prompts = [p for t in example.image_type_list for p in get_image_prompt(t)]
    prompts = [f"[IMAGE{i + 1}] {p}" for i, p in enumerate(prompts)]
    layout = get_layout_instruction(grid_w, grid_h)
    task = get_task_instruction(", ".join(prompts[:-1]), prompts[-1])
    content = (
        get_content_instruction() + example.prompts[-1]
        if example.image_type_list[-1] == "target"
        else ""
    )
    images = [cell for row in grid for cell in row]
    return [example.mask_count, grid_h, grid_w, layout, task, content, 0.4, 30, *images]


def _simple_family(name: str, type_list: list[str], ids: list[str]) -> list[TaskExample]:
    """Two examples per family: the id pair forward and reversed (the
    reference banks hold several curated rows per family; the synthetic pack
    provides two per id pair)."""
    return [
        TaskExample(name=name, image_type_list=type_list, file_ids=ids,
                    prompts=["a photo"] * len(ids)),
        TaskExample(name=f"{name} (alt)", image_type_list=type_list,
                    file_ids=list(reversed(ids)), prompts=["a photo"] * len(ids)),
    ]


# remaining reference gallery families (examples/gradio_tasks*.py); assets
# resolve if present under EXAMPLES_ROOT, otherwise the family lists empty
register_task_family("restoration", [
    TaskExample(name=f"{deg} restoration", image_type_list=[deg, "target"],
                file_ids=["rest_0", "rest_1"], prompts=["a photo", "a photo"])
    for deg in ("GaussianNoise", "GaussianBlur", "JPEG", "LowLight")
])
register_task_family("style_transfer", _simple_family(
    "style transfer", ["style_source", "style_target"], ["style_0", "style_1"]))
register_task_family("style_condition", _simple_family(
    "style transfer with canny", ["canny", "style_source", "style_target"],
    ["style_0", "style_1"]))
register_task_family("tryon", _simple_family(
    "virtual try-on", ["reference", "mask", "target"], ["tryon_0", "tryon_1"]))
register_task_family("relighting", _simple_family(
    "relighting", ["target", "reference"], ["relight_0", "relight_1"]))
register_task_family("photodoodle", _simple_family(
    "photo doodle", ["target", "reference"], ["doodle_0", "doodle_1"]))
register_task_family("editing", _simple_family(
    "depth-guided editing", ["DepthEdit", "target"], ["edit_0", "edit_1"]))
register_task_family("editing_reference", _simple_family(
    "editing with reference", ["reference", "FillEdit", "target"],
    ["edit_0", "edit_1"]))
register_task_family("subject_generation", _simple_family(
    "subject-driven generation", ["reference", "target"], ["subj_0", "subj_1"]))
register_task_family("subject_condition", _simple_family(
    "subject + depth", ["reference", "depth", "target"], ["subj_0", "subj_1"]))
register_task_family("subject_style", _simple_family(
    "subject + style", ["style_source", "reference", "target"],
    ["subj_0", "subj_1"]))
register_task_family("subject_extraction", _simple_family(
    "subject extraction", ["target", "foreground"], ["dense_0", "dense_1"]))
register_task_family("image_generation", _simple_family(
    "reference generation", ["reference", "target"], ["cond_0", "cond_1"]))
register_task_family("unseen_tasks", _simple_family(
    "unseen in-context task", ["mask", "target"], ["unseen_0", "unseen_1"]))
