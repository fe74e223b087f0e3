"""Curated task-example banks for the web demo.

Counterpart of the reference's examples/ package (examples/*.py, 1312 LoC):
each task family registers galleries of asset paths plus a `process_*` hook
that returns the demo's output signature
  [mask, grid_h, grid_w, layout_prompt, task_prompt, content_prompt,
   upsampling_noise, steps, *images].
The reference ships image assets in-repo; here galleries resolve against an
EXAMPLES_ROOT directory and degrade to empty lists when assets are absent.
"""

from .gradio_tasks import (
    TaskExample,
    asset_path,
    dense_prediction_tasks,
    conditional_generation_tasks,
    generate_paths_from_id,
    process_tasks,
    refresh_task_families,
    register_task_family,
    task_families,
)

__all__ = [
    "TaskExample", "asset_path", "dense_prediction_tasks",
    "conditional_generation_tasks", "generate_paths_from_id", "process_tasks",
    "refresh_task_families", "register_task_family", "task_families",
]
