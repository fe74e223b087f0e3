"""Reference-exact prompt-bank parity (VERDICT r3 item #1).

The released 384/512 LoRAs were trained on the EXACT template strings in the
reference's data/prefix_instruction.py — eval (sample.py) and released-weight
serving must draw those strings or the model sees out-of-distribution
prompts and the PSNR-vs-reference protocol breaks. These tests assert:

1. the committed reference_bank.json matches a fresh AST extraction of the
   reference tables string-for-string (skips when /root/reference is absent);
2. with the same random.Random state, this repo's getters draw BIT-IDENTICAL
   strings to a simulation of the reference's own random.choice sequence
   (same list lengths, same choice order — ref :676-729);
3. the bank plumbing: global/per-call selection, env override, fail-loud on
   unknown banks, and the 'original' bank staying intact for from-scratch
   training.
"""

from __future__ import annotations

import os
import random
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parents[1]
REF_FILE = Path("/root/reference/data/prefix_instruction.py")

sys.path.insert(0, str(REPO_ROOT / "scripts"))

from visualcloze_tpu.data import prefix_instruction as pi  # noqa: E402


@pytest.fixture(autouse=True)
def _reset_bank():
    prev = pi.get_prompt_bank()
    yield
    pi.set_prompt_bank(prev)


def _bank():
    return pi._reference_bank()


# ----------------------- 1. committed JSON == reference -----------------------


@pytest.mark.skipif(not REF_FILE.exists(), reason="reference tree not available")
def test_committed_bank_matches_reference_extraction():
    from extract_reference_bank import extract

    fresh = extract(REF_FILE)
    committed = _bank()
    assert committed["layout_templates"] == fresh["layout_templates"]
    assert committed["task_templates"] == fresh["task_templates"]
    assert committed["content_templates"] == fresh["content_templates"]
    assert committed["image_prompts"] == fresh["image_prompts"]


def test_bank_shape():
    b = _bank()
    assert len(b["layout_templates"]) == 10  # ref :684-697
    assert len(b["task_templates"]) == 10  # ref :700-713
    assert len(b["content_templates"]) == 10  # ref :716-729
    assert len(b["image_prompts"]) == 49  # ref :54-682
    # every type the registries use resolves (incl. the two-column style keys)
    for task in pi.graph200k_task_dicts + pi.test_task_dicts:
        for row in task["image_list"]:
            for t in row:
                pi.get_image_prompt(t, bank="reference")
    # ~10 hand-written variants per type (two ref types have 9)
    assert all(len(v) >= 9 for v in b["image_prompts"].values())


# ----------------------- 2. bit-identical draws -----------------------
# The reference renders f-strings into a 10-list then random.choice's it
# (one _randbelow(10) consumption). Our getters choice a 10-list of format
# templates then .format — same consumption, same resulting string.


def test_layout_draws_bit_identical_to_reference_protocol():
    for seed in range(20):
        for cols, rows in [(2, 1), (3, 2), (5, 5)]:
            ref_rng, our_rng = random.Random(seed), random.Random(seed)
            expected = ref_rng.choice(
                [t.format(rows=rows, cols=cols, total=cols * rows)
                 for t in _bank()["layout_templates"]]
            )
            got = pi.get_layout_instruction(cols, rows, rng=our_rng, bank="reference")
            assert got == expected
            assert our_rng.getstate() == ref_rng.getstate()  # same rng consumption


def test_task_and_content_draws_bit_identical():
    c, t = "[IMAGE1] a depth map of the scene", "[IMAGE2] a high-quality image"
    for seed in range(20):
        ref_rng, our_rng = random.Random(seed), random.Random(seed)
        expected = ref_rng.choice(
            [s.format(condition_prompt=c, target_prompt=t)
             for s in _bank()["task_templates"]]
        )
        assert pi.get_task_instruction(c, t, rng=our_rng, bank="reference") == expected
        expected = ref_rng.choice(_bank()["content_templates"])
        assert pi.get_content_instruction(rng=our_rng, bank="reference") == expected
        assert our_rng.getstate() == ref_rng.getstate()


def test_image_prompt_draws_bit_identical():
    b = _bank()["image_prompts"]
    types = ["target", "reference", "depth", "GaussianBlur", "FillEdit"]
    for seed in range(10):
        ref_rng, our_rng = random.Random(seed), random.Random(seed)
        for t in types:
            assert pi.get_image_prompt(t, rng=our_rng, bank="reference") == [
                ref_rng.choice(b[t])
            ]
        # style types draw style_source then style_target (ref :676-677)
        for t in pi.style_list:
            expected = [ref_rng.choice(b["style_source"]), ref_rng.choice(b["style_target"])]
            assert pi.get_image_prompt(t, rng=our_rng, bank="reference") == expected
        assert our_rng.getstate() == ref_rng.getstate()


def test_content_templates_are_strippable_by_sdedit():
    """SDEdit prefix-stripping must recognize every reference content prefix."""
    from visualcloze_tpu.pipeline.visualcloze import CONTENT_INSTRUCTIONS

    for prefix in _bank()["content_templates"]:
        assert prefix in CONTENT_INSTRUCTIONS


# ----------------------- 3. bank plumbing -----------------------


def test_default_bank_is_reference():
    # sample.py / serving / training draw reference strings out of the box
    assert pi.get_prompt_bank() == "reference"
    rng = random.Random(0)
    s = pi.get_layout_instruction(3, 2, rng=rng)
    assert s in [t.format(rows=2, cols=3, total=6) for t in _bank()["layout_templates"]]


def test_set_prompt_bank_switches_globally():
    pi.set_prompt_bank("original")
    rng = random.Random(0)
    s = pi.get_layout_instruction(3, 2, rng=rng)
    ref_renders = [t.format(rows=2, cols=3, total=6) for t in _bank()["layout_templates"]]
    # the original bank shares one incidental template with the reference
    # (VERDICT r3: layout overlap 2/10) — draw all 10 and require divergence
    originals = {pi.get_layout_instruction(3, 2, rng=random.Random(k)) for k in range(50)}
    assert not originals.issubset(set(ref_renders))
    assert isinstance(s, str) and "2" in s and "3" in s and "6" in s


def test_per_call_bank_overrides_global():
    pi.set_prompt_bank("original")
    rng = random.Random(1)
    s = pi.get_content_instruction(rng=rng, bank="reference")
    assert s in _bank()["content_templates"]


def test_unknown_bank_fails_loud():
    with pytest.raises(ValueError, match="unknown prompt bank"):
        pi.set_prompt_bank("gpt")
    with pytest.raises(ValueError, match="unknown prompt bank"):
        pi.get_layout_instruction(2, 2, bank="nope")


def test_original_bank_intact():
    pi.set_prompt_bank("original")
    for task in pi.graph200k_task_dicts:
        for row in task["image_list"]:
            for t in row:
                assert pi.get_image_prompt(t)
    with pytest.raises(KeyError):
        pi.get_image_prompt_variants("not-a-type")
    with pytest.raises(KeyError):
        pi.get_image_prompt_variants("not-a-type", bank="reference")


def test_data_reader_draws_reference_strings_by_default(tmp_path):
    """End-to-end: the test-mode item processor (what sample.py calls) emits
    instruction strings rendered from the reference tables."""
    import numpy as np
    from PIL import Image

    from visualcloze_tpu.data import Graph200KItemProcessor

    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 256, (64, 64, 3), dtype=np.uint8)
    )
    paths = {}
    for name in ("target", "depth"):
        p = tmp_path / f"{name}.png"
        img.save(p)
        paths[name] = str(p)
    record = {
        "condition": paths,
        "description": {"item": "a cube", "description_0": "on a table"},
        "quality_assessment": {"objectConsistency": 5},
    }
    proc = Graph200KItemProcessor(resolution=64)
    _, _, prompts, _, _ = proc.process_item(
        [record], training_mode=False, image_type_list=["depth", "target"],
        context_num=1, rng=random.Random(0),
    )
    layout, task, content = prompts
    b = _bank()
    assert layout in [t.format(rows=1, cols=2, total=2) for t in b["layout_templates"]]
    # the task instruction is a reference template rendered around two
    # [IMAGE*]-tagged reference image prompts
    import re

    assert "[IMAGE1]" in task and "[IMAGE2]" in task
    patterns = [
        re.escape(s).replace(r"\{condition_prompt\}", ".+").replace(
            r"\{target_prompt\}", ".+"
        )
        for s in b["task_templates"]
    ]
    assert any(re.fullmatch(p, task) for p in patterns), task
    assert any(content.startswith(p) for p in b["content_templates"])


def test_env_bank_typo_fails_at_import():
    """A typo'd VC_PROMPT_BANK must fail at process start, not at the first
    template draw deep inside a training run."""
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "-c", "import visualcloze_tpu.data.prefix_instruction"],
        env={**os.environ, "VC_PROMPT_BANK": "referense", "JAX_PLATFORMS": "cpu"},
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode != 0
    assert "unknown prompt bank" in r.stderr

    r = subprocess.run(
        [sys.executable, "-c", "import visualcloze_tpu.data.prefix_instruction"],
        env={**os.environ, "VC_PROMPT_BANK": "original", "JAX_PLATFORMS": "cpu"},
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr
