"""Prompt templates and the task registry.

Counterpart of the reference's config-as-code task space
(data/prefix_instruction.py:1-1085): per-image-type descriptions, layout /
task / content instruction templates, the condition/style/editing/degradation
type lists, and the Graph200K training (graph200k_task_dicts) and evaluation
(test_task_dicts) registries.

The registry STRUCTURE (keys, image types, sample weights, task composition)
mirrors the reference so datasets and checkpoints interoperate; the template
TEXT is an original bank with the same role (randomized natural-language
instructions) — swap in a custom bank by editing these lists.
"""

from __future__ import annotations

import random

# ----------------------------- type lists -----------------------------

condition_list = [
    "canny", "depth", "hed", "normal", "mlsd", "openpose", "sam2_mask",
    "mask", "foreground", "background", "uniformer",
]

# ordering used inside the task registries (ref :736-747 — uniformer sits
# before mask there, unlike condition_list)
_TASK_CONDS = [
    "canny", "depth", "hed", "normal", "mlsd", "openpose", "sam2_mask",
    "uniformer", "mask", "foreground", "background",
]

style_list = ["InstantStyle", "ReduxStyle"]

editing_list = ["DepthEdit", "FillEdit"]

# Key-for-key the reference's restoration task space
# (ref data/prefix_instruction.py:6-51) so Graph200K runs are reproducible.
degradation_list = [
    # blur
    "blur",
    "compression",
    "SRx2",
    "SRx4",
    "pixelate",
    "Defocus",
    "GaussianBlur",
    # sharpen
    "oversharpen",
    # noise
    "GaussianNoise",
    "PoissonNoise",
    "SPNoise",
    # mosaic
    "mosaic",
    # contrast
    "contrast_strengthen",
    "contrast_weaken",
    # quantization
    "quantization",
    "JPEG",
    # light
    "brighten",
    "darken",
    "LowLight",
    # color
    "saturate_strengthen",
    "saturate_weaken",
    "gray",
    "ColorDistortion",
    # infilling
    "Inpainting",
    # rotate
    "rotate90",
    "rotate180",
    "rotate270",
    # other
    "Barrel",
    "Pincushion",
    "Elastic",
    # spacial effect
    "Rain",
    "Frost",
]


# ----------------------------- template banks -----------------------------

_IMAGE_PROMPTS: dict[str, list[str]] = {
    "target": [
        "a high-quality photograph",
        "the clean reference photo",
        "an aesthetically pleasing image",
        "a sharp, well-exposed picture",
        "the original full-color image",
    ],
    "reference": [
        "a reference image of the same subject",
        "an image showing the identical object in another scene",
        "a photo depicting the same item elsewhere",
    ],
    "canny": [
        "a canny edge map of the image",
        "white edge contours on a black background",
        "an edge-detection sketch of the scene",
    ],
    "depth": [
        "a depth map of the scene",
        "a grayscale map where brightness encodes distance",
        "a per-pixel depth estimation result",
    ],
    "hed": [
        "a holistically-nested edge map",
        "a soft edge drawing of the image",
    ],
    "normal": [
        "a surface normal map",
        "an RGB-encoded normal estimation of the scene",
    ],
    "mlsd": [
        "a wireframe of straight line segments",
        "an M-LSD line segment detection map",
    ],
    "openpose": [
        "a human pose skeleton rendering",
        "an openpose keypoint diagram",
    ],
    "sam2_mask": [
        "a colorful SAM2 segmentation of all regions",
        "an automatic everything-mask segmentation",
    ],
    "uniformer": [
        "a semantic segmentation map",
        "a palette-colored semantic parsing of the scene",
    ],
    "mask": [
        "the image with a random region masked out",
        "a partially occluded copy of the image",
    ],
    "foreground": [
        "the extracted foreground subject on a plain backdrop",
        "the salient object cut out from its background",
    ],
    "background": [
        "the background with the subject removed",
        "the scene with the main object erased",
    ],
    # style types expand into two columns: the style source swatch and the
    # stylized content image (ref :676-677 returns one prompt for each)
    "style_source": [
        "an image that defines the artistic style to imitate",
        "a swatch carrying the palette and brushwork of the style",
        "the style exemplar whose look should be borrowed",
    ],
    "style_target": [
        "an image rendered in that distinctive artistic style",
        "a stylized variant sharing the palette of its style pair",
        "the content re-imagined with the exemplar's style",
    ],
    "DepthEdit": [
        "a new image generated from the depth layout",
        "a depth-guided re-synthesis of the scene",
    ],
    "FillEdit": [
        "an edited image with new content filled into the masked region",
        "the image after inpainting-based object replacement",
    ],
}


def _degradation_prompt(deg: str) -> list[str]:
    return [
        f"the image degraded by {deg}",
        f"a corrupted copy of the image ({deg})",
        f"the picture after applying the {deg} degradation",
    ]


def get_image_prompt(image_type: str, rng=random) -> list[str]:
    """One randomly chosen prompt per column the type produces (ref :676-681):
    style types yield [style-source prompt, style-target prompt]; every other
    type yields a single-element list. rng: any random.Random-like source."""
    if image_type in style_list:
        return [
            rng.choice(_IMAGE_PROMPTS["style_source"]),
            rng.choice(_IMAGE_PROMPTS["style_target"]),
        ]
    return [rng.choice(get_image_prompt_variants(image_type))]


def get_image_prompt_variants(image_type: str) -> list[str]:
    """All template variants for one (single-column) image type (ref :54-682)."""
    if image_type in _IMAGE_PROMPTS:
        return _IMAGE_PROMPTS[image_type]
    if image_type in degradation_list:
        return _degradation_prompt(image_type)
    raise KeyError(f"unknown image type {image_type!r}")


def get_layout_instruction(cols: int, rows: int, rng=random) -> str:
    """Randomized grid-layout prompt (ref :684-697)."""
    templates = [
        "A grid layout with {rows} rows and {cols} columns, displaying {total} images arranged side by side.",
        "{total} images are organized into a grid of {rows} rows and {cols} columns, evenly spaced.",
        "An image grid of {rows} by {cols}, containing {total} sub-images in a regular arrangement.",
        "The picture is split into {rows} rows and {cols} columns, {total} tiles in total.",
        "A composite of {total} images laid out in {rows} rows and {cols} columns.",
        "Arranged as {rows}x{cols}, the canvas holds {total} individual images.",
        "This composition shows {total} panels in a {rows}-row, {cols}-column grid.",
        "A tiled sheet with {rows} horizontal bands and {cols} vertical slots, {total} images overall.",
        "The frame contains a {rows}x{cols} matrix of {total} images.",
        "{total} sub-pictures fill a grid that is {rows} rows tall and {cols} columns wide.",
    ]
    return rng.choice(templates).format(rows=rows, cols=cols, total=rows * cols)


def get_task_instruction(condition_prompt: str, target_prompt: str, rng=random) -> str:
    """Randomized in-context task prompt (ref :700-713)."""
    templates = [
        "In each row, a logical procedure derives the right-most image from the left: from <{c}> to <{t}>.",
        "Every row demonstrates the same transformation, mapping <{c}> to <{t}>.",
        "Each row applies one rule: the inputs are <{c}> and the output is <{t}>.",
        "Rows share a common mapping whose source is <{c}> and whose result is <{t}>.",
        "Following the in-context examples, <{c}> on the left produces <{t}> on the right.",
        "The right-most image of every row is obtained from the others: <{c}> becomes <{t}>.",
        "A consistent process turns <{c}> into <{t}> across all rows.",
        "Use the pattern of the demonstration rows: given <{c}>, generate <{t}>.",
        "All rows obey one rule that converts <{c}> into <{t}>.",
        "The transformation illustrated row by row maps <{c}> onto <{t}>.",
    ]
    return rng.choice(templates).format(c=condition_prompt, t=target_prompt)


def get_content_instruction(rng=random) -> str:
    """Randomized content-prompt prefix (ref :716-729). The upsampling stage
    strips exactly these prefixes (pipeline/visualcloze.CONTENT_INSTRUCTIONS)."""
    prefixes = [
        "The content of the last image in the final row is: ",
        "The last image of the last row depicts: ",
        "In the final row, the last image shows: ",
        "The last image in the bottom row illustrates: ",
        "The content of the bottom-right image is: ",
        "The final image in the last row portrays: ",
        "The last image of the final row displays: ",
        "In the last row, the final image captures: ",
        "The bottom-right corner image presents: ",
        "The content of the last image in the concluding row is: ",
    ]
    return rng.choice(prefixes)


# ----------------------------- task registries -----------------------------
# Row specs are key-for-key the reference's (ref data/prefix_instruction.py:
# 732-971 train, 974-1085 test) so a reference Graph200K run reproduces here:
# same 12 train / 11 test groups, same image_list compositions and weights.
# Style types occupy the LAST slot of their rows — they expand to two columns
# (style source, stylized target), making the stylized image the target cell.

# conditions that support a given composition family (exact reference subsets)
_COND_WITH_REF = [c for c in _TASK_CONDS if c != "foreground"]  # ref :754-764
_COND_WITH_STYLE = _TASK_CONDS[:9]  # canny..uniformer, mask (ref :771-789)
_DENSE_CONDS = _TASK_CONDS[:8]  # canny..uniformer (ref :850-857)

graph200k_task_dicts: list[dict] = [
    {
        "task_name": "conditional generation",
        "sample_weight": 1,
        "image_list": [[c, "target"] for c in _TASK_CONDS],
    },
    {
        "task_name": "conditional generation with reference",
        "sample_weight": 1,
        "image_list": [["reference", c, "target"] for c in _COND_WITH_REF],
    },
    {
        "task_name": "conditional generation with style",
        "sample_weight": 1,
        "image_list": [[c, "InstantStyle"] for c in _COND_WITH_STYLE]
        + [[c, "ReduxStyle"] for c in _COND_WITH_STYLE],
    },
    {
        "task_name": "image generation with reference",
        "sample_weight": 1,
        "image_list": [["reference", "target"]],
    },
    {
        "task_name": "subject extraction",
        "sample_weight": 1,
        "image_list": [["target", "reference"]],
    },
    {
        "task_name": "style transfer",
        "sample_weight": 1,
        "image_list": [
            ["target", "InstantStyle"],
            ["target", "ReduxStyle"],
            ["reference", "InstantStyle"],
        ],
    },
    {
        "task_name": "style transfer with condition",
        "sample_weight": 1,
        "image_list": [["reference", c, "InstantStyle"] for c in _COND_WITH_STYLE],
    },
    {
        "task_name": "image editing",
        "sample_weight": 1,
        "image_list": [[e, "target"] for e in editing_list],
    },
    {
        "task_name": "image editing with reference",
        "sample_weight": 1,
        "image_list": [["reference", e, "target"] for e in editing_list],
    },
    {
        "task_name": "dense prediction",
        "sample_weight": 1,
        "image_list": [["target", c] for c in _DENSE_CONDS],
    },
    {
        "task_name": "restoration",
        "sample_weight": 1,
        "image_list": [[deg, "target"] for deg in degradation_list],
    },
    {
        "task_name": "restoration with reference",
        "sample_weight": 1,
        "image_list": [["reference", deg, "target"] for deg in degradation_list],
    },
]

test_task_dicts: list[dict] = [
    {
        "task_name": "conditional generation",
        "sample_weight": 1,
        "image_list": [[c, "target"] for c in _TASK_CONDS],
    },
    {
        "task_name": "image generation with reference",
        "sample_weight": 1,
        "image_list": [["reference", "target"]],
    },
    {
        "task_name": "conditional generation with reference",
        "sample_weight": 1,
        "image_list": [
            ["reference", "depth", "target"],
            ["reference", "openpose", "target"],
        ],
    },
    {
        "task_name": "subject extraction",
        "sample_weight": 0.2,
        "image_list": [["target", "reference"]],
    },
    {
        "task_name": "dense prediction",
        "sample_weight": 1,
        "image_list": [["target", "depth"], ["target", "openpose"]],
    },
    {
        "task_name": "restoration",
        "sample_weight": 1,
        "image_list": [
            ["GaussianBlur", "target"],
            ["Inpainting", "target"],
            ["rotate90", "target"],
            ["Elastic", "target"],
        ],
    },
    {
        "task_name": "restoration with reference",
        "sample_weight": 1,
        "image_list": [["reference", "Inpainting", "target"]],
    },
    {
        "task_name": "image editing with reference",
        "sample_weight": 1,
        "image_list": [
            ["reference", "DepthEdit", "target"],
            ["reference", "FillEdit", "target"],
        ],
    },
    {
        "task_name": "style transfer",
        "sample_weight": 1,
        "image_list": [
            ["target", "InstantStyle"],
            ["target", "ReduxStyle"],
            ["reference", "InstantStyle"],
        ],
    },
    {
        "task_name": "style transfer with condition",
        "sample_weight": 1,
        "image_list": [["reference", c, "InstantStyle"] for c in _COND_WITH_STYLE],
    },
    {
        "task_name": "subject extraction",
        "sample_weight": 1,
        "image_list": [["target", "reference"]],
    },
]
