"""Gradio web demo (counterpart of the reference app.py:1-525).

A dynamic up-to-5x5 grid UI with three prompt boxes (layout auto-filled),
advanced sampling options, and the same generate flow as inference.py.
Gradio is an optional dependency; the module degrades to a clear error when
it is unavailable (this image ships without gradio).
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

MAX_GRID = 5

DEFAULTS = dict(seed=0, cfg=30.0, steps=30, upsampling_steps=10, upsampling_noise=0.4)


def build_model(args):
    if args.demo:
        from visualcloze_tpu.pipeline import random_components

        return random_components(jax.random.PRNGKey(0), tiny=True, resolution=64)
    from visualcloze_tpu.pipeline import build_visualcloze

    return build_visualcloze(
        model_path=args.model_path, model_name=args.model_name,
        lora_rank=args.lora_rank, resolution=args.resolution,
    )


def layout_prompt(rows: int, cols: int) -> str:
    return (
        f"A grid layout with {rows} rows and {cols} columns, "
        f"displaying {rows * cols} images arranged side by side."
    )


def generate(model, grid_h, grid_w, images, layout, task, content,
             seed, cfg, steps, upsampling_steps, upsampling_noise, is_upsampling):
    grid = []
    for i in range(int(grid_h)):
        row = []
        for j in range(int(grid_w)):
            row.append(images[i * MAX_GRID + j])
        grid.append(row)
    model.set_grid_size(int(grid_h), int(grid_w))
    outs = model.process_images(
        grid, [layout, task, content],
        seed=int(seed), cfg=float(cfg), steps=int(steps),
        upsampling_steps=int(upsampling_steps),
        upsampling_noise=float(upsampling_noise),
        is_upsampling=bool(is_upsampling),
    )
    return outs[0] if outs else None


def gallery_entries() -> dict[str, list]:
    """Per-family (thumbnail_path, example) lists for the demo galleries
    (ref app.py:163-276 wires 16 task-family example banks). Gradio-free so
    tests can validate the galleries without the UI dependency."""
    from examples import refresh_task_families

    families = refresh_task_families()
    out = {}
    for family, examples in families.items():
        entries = []
        for ex in examples:
            row = ex.rows(context_num=1)[0]
            thumb = next((c for c in row if c), None)
            if thumb:
                entries.append((thumb, ex))
        if entries:
            out[family] = entries
    return out


def apply_example_outputs(example, context_num: int = 1):
    """process_tasks output -> values for the UI components:
    [grid_h, grid_w, layout, task, content, upsampling_noise, steps,
    *25 cell values (None where hidden/masked)]."""
    from examples import process_tasks
    from PIL import Image as PILImage

    out = process_tasks(example, context_num)
    _mask_count, gh, gw, layout_v, task_v, content_v, noise_v, steps_v = out[:8]
    images = out[8:]
    cells: list = [None] * (MAX_GRID * MAX_GRID)
    for r in range(gh):
        for c in range(gw):
            path = images[r * gw + c]
            cells[r * MAX_GRID + c] = PILImage.open(path) if path else None
    return [gh, gw, layout_v, task_v, content_v, noise_v, steps_v, *cells]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", default=None)
    p.add_argument("--model_name", default="flux-dev-fill-lora")
    p.add_argument("--resolution", type=int, default=384)
    p.add_argument("--lora_rank", type=int, default=256)
    p.add_argument("--demo", action="store_true")
    p.add_argument("--port", type=int, default=7860)
    args = p.parse_args()

    try:
        import gradio as gr
    except ImportError as e:
        raise SystemExit(
            "gradio is not installed in this environment; install it to run the "
            "web demo, or use inference.py / sample.py for CLI access"
        ) from e

    model = build_model(args)
    demo = build_ui(gr, model)
    demo.launch(server_port=args.port)


def build_ui(gr, model):
    """Construct the gr.Blocks graph (no launch) — factored out of main()
    so the real-gradio smoke test (tests/test_app_ui.py, skip-if-no-gradio)
    and the mocked-UI test build the SAME graph."""
    with gr.Blocks(title="VisualCloze TPU") as demo:
        gr.Markdown("# VisualCloze (TPU-native)\nVisual in-context learning: "
                    "fill the grid with demonstration rows, leave the target cell empty.")
        with gr.Row():
            grid_h = gr.Slider(1, MAX_GRID, value=2, step=1, label="Rows")
            grid_w = gr.Slider(1, MAX_GRID, value=2, step=1, label="Columns")
        cells = []
        for i in range(MAX_GRID):
            with gr.Row():
                for j in range(MAX_GRID):
                    cells.append(gr.Image(type="pil", label=f"({i + 1},{j + 1})", visible=i < 2 and j < 2))

        def update_grid(h, w):
            return [gr.update(visible=(i // MAX_GRID) < h and (i % MAX_GRID) < w)
                    for i in range(MAX_GRID * MAX_GRID)]

        grid_h.change(update_grid, [grid_h, grid_w], cells)
        grid_w.change(update_grid, [grid_h, grid_w], cells)

        layout = gr.Textbox(label="Layout prompt", value=layout_prompt(2, 2))
        grid_h.change(lambda h, w: layout_prompt(int(h), int(w)), [grid_h, grid_w], layout)
        grid_w.change(lambda h, w: layout_prompt(int(h), int(w)), [grid_h, grid_w], layout)
        task = gr.Textbox(label="Task prompt")
        content = gr.Textbox(label="Content prompt")
        with gr.Accordion("Advanced options", open=False):
            seed = gr.Number(value=DEFAULTS["seed"], label="Seed (0 = random)")
            cfg = gr.Slider(1.0, 50.0, value=DEFAULTS["cfg"], label="Guidance")
            steps = gr.Slider(1, 100, value=DEFAULTS["steps"], step=1, label="Steps")
            upsampling_steps = gr.Slider(1, 50, value=DEFAULTS["upsampling_steps"], step=1,
                                         label="Upsampling steps")
            upsampling_noise = gr.Slider(0.0, 1.0, value=DEFAULTS["upsampling_noise"],
                                         label="Upsampling noise (1 = off)")
            is_upsampling = gr.Checkbox(value=True, label="SDEdit upsampling")
        btn = gr.Button("Generate", variant="primary")
        output = gr.Image(label="Result")

        # --- task-family example galleries (ref app.py:163-276, 343-374) ---
        example_targets = [grid_h, grid_w, layout, task, content,
                           upsampling_noise, steps, *cells]
        with gr.Accordion("Task examples", open=True):
            for family, entries in gallery_entries().items():
                with gr.Tab(family.replace("_", " ")):
                    gallery = gr.Gallery(
                        value=[(thumb, ex.name) for thumb, ex in entries],
                        columns=4, height=140, label=family,
                    )

                    def on_select(evt: gr.SelectData, entries=entries):
                        _, ex = entries[evt.index]
                        return apply_example_outputs(ex)

                    gallery.select(on_select, None, example_targets)

        def on_click(h, w, *rest):
            n = MAX_GRID * MAX_GRID
            images = list(rest[:n])
            (layout_v, task_v, content_v, seed_v, cfg_v, steps_v,
             us_v, un_v, isu_v) = rest[n:]
            return generate(model, h, w, images, layout_v, task_v, content_v,
                            seed_v, cfg_v, steps_v, us_v, un_v, isu_v)

        btn.click(
            on_click,
            [grid_h, grid_w, *cells, layout, task, content, seed, cfg, steps,
             upsampling_steps, upsampling_noise, is_upsampling],
            output,
        )

    return demo


if __name__ == "__main__":
    main()
