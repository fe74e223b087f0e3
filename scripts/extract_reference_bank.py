"""Extract the reference's prompt-template tables into a JSON data bank.

The released VisualCloze LoRAs (384/512) were trained on the EXACT template
strings in the reference's ``data/prefix_instruction.py`` — any evaluation or
released-weight serving that draws prompts from a different bank feeds the
model out-of-distribution text, and the PSNR-vs-reference north-star becomes
unmeasurable. This script AST-parses the reference file (no import, no code
execution — the tables are pure string constants) and emits
``visualcloze_tpu/data/reference_bank.json``, which the runtime loads as the
default prompt bank (see ``visualcloze_tpu/data/prefix_instruction.py``).

Extracted tables (reference file:line):
  - image_prompts       get_image_prompt's dict, :54-682 (49 keys, plain lists)
  - layout_templates    get_layout_instruction, :684-697 (f-strings)
  - task_templates      get_task_instruction, :700-713 (f-strings)
  - content_templates   get_content_instruction, :716-729 (plain strings)

F-string templates are converted to ``str.format`` templates with a fixed
placeholder mapping (``rows``/``cols``/``cols*rows``→``total``;
``condition_prompt``/``target_prompt``), so the runtime renders the exact
same final strings the reference renders.

Usage:
    python scripts/extract_reference_bank.py \
        [--reference /root/reference/data/prefix_instruction.py] \
        [--out visualcloze_tpu/data/reference_bank.json] [--check]

``--check`` re-extracts and diffs against the committed JSON (exit 1 on
mismatch) — used by tests/test_prompt_bank.py when the reference is present.
"""

from __future__ import annotations

import argparse
import ast
import json
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
DEFAULT_REF = Path("/root/reference/data/prefix_instruction.py")
DEFAULT_OUT = REPO_ROOT / "visualcloze_tpu" / "data" / "reference_bank.json"

# fixed mapping from the f-string expressions the reference templates use to
# .format placeholder names; anything outside this set is an extraction error
_EXPR_PLACEHOLDERS = {
    "rows": "rows",
    "cols": "cols",
    "cols * rows": "total",
    "rows * cols": "total",
    "condition_prompt": "condition_prompt",
    "target_prompt": "target_prompt",
}


def _escape_braces(text: str) -> str:
    return text.replace("{", "{{").replace("}", "}}")


def _fstring_to_template(node: ast.expr) -> str:
    """JoinedStr -> str.format template; plain Constant passes through."""
    if isinstance(node, ast.Constant) and isinstance(node.value, str):
        return _escape_braces(node.value)
    if not isinstance(node, ast.JoinedStr):
        raise ValueError(f"expected string template, got {ast.dump(node)[:80]}")
    parts: list[str] = []
    for piece in node.values:
        if isinstance(piece, ast.Constant):
            parts.append(_escape_braces(str(piece.value)))
        elif isinstance(piece, ast.FormattedValue):
            expr = ast.unparse(piece.value)
            if expr not in _EXPR_PLACEHOLDERS:
                raise ValueError(f"unmapped f-string expression {expr!r}")
            parts.append("{" + _EXPR_PLACEHOLDERS[expr] + "}")
        else:
            raise ValueError(f"unexpected f-string piece {type(piece).__name__}")
    return "".join(parts)


def _find_function(tree: ast.Module, name: str) -> ast.FunctionDef:
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name == name:
            return node
    raise LookupError(f"function {name} not found in reference file")


def _local_list_assign(fn: ast.FunctionDef, kind: str) -> list[str]:
    """The single local list-of-templates assignment inside a template fn."""
    for node in ast.walk(fn):
        if isinstance(node, ast.Assign) and isinstance(node.value, ast.List):
            return [_fstring_to_template(el) for el in node.value.elts]
    raise LookupError(f"no template list found in {fn.name} ({kind})")


def extract(reference_path: Path) -> dict:
    tree = ast.parse(reference_path.read_text())

    image_prompts: dict[str, list[str]] = {}
    fn = _find_function(tree, "get_image_prompt")
    for node in ast.walk(fn):
        if isinstance(node, ast.Assign) and isinstance(node.value, ast.Dict):
            for k, v in zip(node.value.keys, node.value.values):
                image_prompts[ast.literal_eval(k)] = ast.literal_eval(v)
    if not image_prompts:
        raise LookupError("image_prompts dict not found in get_image_prompt")

    return {
        "_provenance": (
            "AST-extracted from the reference data/prefix_instruction.py "
            "(image prompts :54-682, layout :684-697, task :700-713, "
            "content :716-729) by scripts/extract_reference_bank.py; these "
            "exact strings are the prompt distribution the released LoRAs "
            "were trained on — required verbatim for eval/serving parity."
        ),
        "image_prompts": image_prompts,
        "layout_templates": _local_list_assign(
            _find_function(tree, "get_layout_instruction"), "layout"
        ),
        "task_templates": _local_list_assign(
            _find_function(tree, "get_task_instruction"), "task"
        ),
        "content_templates": _local_list_assign(
            _find_function(tree, "get_content_instruction"), "content"
        ),
    }


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--reference", type=Path, default=DEFAULT_REF)
    ap.add_argument("--out", type=Path, default=DEFAULT_OUT)
    ap.add_argument(
        "--check",
        action="store_true",
        help="diff against the committed JSON instead of writing it",
    )
    args = ap.parse_args(argv)

    if not args.reference.exists():
        print(f"reference file not found: {args.reference}", file=sys.stderr)
        return 2
    bank = extract(args.reference)

    if args.check:
        committed = json.loads(args.out.read_text())
        if committed != bank:
            print("committed bank DIFFERS from reference extraction", file=sys.stderr)
            return 1
        print(f"OK: {args.out} matches the reference tables")
        return 0

    args.out.write_text(json.dumps(bank, indent=1, ensure_ascii=False) + "\n")
    n = sum(len(v) for v in bank["image_prompts"].values())
    print(
        f"wrote {args.out}: {len(bank['image_prompts'])} image types / {n} prompts, "
        f"{len(bank['layout_templates'])} layout, {len(bank['task_templates'])} task, "
        f"{len(bank['content_templates'])} content templates"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
