"""CI-mode run of the one-command real-weight validation harness
(scripts/validate_weights.py): tiny random weights go through the REAL
converter -> torch-oracle activation diff -> all five BASELINE configs ->
quality gates -> report. VERDICT r3 item #2's done-condition."""

from __future__ import annotations

import json
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

GATE_NAMES = {
    "conversion_fidelity", "psnr_vs_reference", "int8_weight_only", "w8a8",
    "cached:2", "cached:3", "int4_t5",
}


@pytest.mark.slow
def test_validate_weights_ci_end_to_end(tmp_path):
    from scripts.validate_weights import main

    rc = main(["--ci", "--steps", "3", "--upsampling_steps", "3",
               "--out", str(tmp_path)])
    assert rc == 0

    report = json.loads((tmp_path / "report.json").read_text())
    assert report["mode"] == "ci"
    gates = {g["name"]: g for g in report["gates"]}
    assert set(gates) == GATE_NAMES

    # conversion fidelity is exact numerics — must PASS even on random weights
    assert gates["conversion_fidelity"]["status"] == "PASS"
    # per-block diff localizes errors: every double/single block reported
    per_block = report["act_diff"]["per_block_psnr"]
    assert "out" in per_block and any(k.startswith("double_img") for k in per_block)
    assert any(k.startswith("single_") for k in per_block)

    # without --reference_outputs the north-star gate is SKIP, not silently PASS
    assert gates["psnr_vs_reference"]["status"] == "SKIP"
    # CI reports the fast-mode gates as measured INFO (thresholds are
    # meaningless on random weights) with actionable flips
    for name in ("int8_weight_only", "w8a8", "cached:2", "cached:3", "int4_t5"):
        assert gates[name]["status"] == "INFO", name
        assert "dB" in gates[name]["value"], name
        assert gates[name]["flip"], name

    # all five BASELINE.json configs ran; inputs + outputs persisted so the
    # torch reference can be replayed on the same pixels
    assert set(report["configs"]) == {
        "depth_to_image", "incontext_2rows", "consolidation",
        "reverse_generation", "two_stage_sdedit",
    }
    for name in report["configs"]:
        assert (tmp_path / "inputs" / name / "query.json").exists()
        assert (tmp_path / "outputs" / f"{name}.png").exists()
    # the consolidation config generates 2 masked cells in one pass
    assert report["configs"]["consolidation"]["outputs"] == 2


def test_baseline_configs_cover_the_five():
    """The harness's config list matches BASELINE.json's five eval configs."""
    from scripts.validate_weights import baseline_configs

    specs = baseline_configs(64, steps=2, ups_steps=2)
    names = [s["name"] for s in specs]
    assert names == ["depth_to_image", "incontext_2rows", "consolidation",
                     "reverse_generation", "two_stage_sdedit"]
    # 2 demonstration rows + query row
    assert len(specs[1]["grid"]) == 3
    # consolidation: two masked cells in the query row
    assert sum(c is None for c in specs[2]["grid"][0]) == 2
    # two-stage runs SDEdit
    assert specs[4]["is_upsampling"]
    # reverse generation: the photo is the input, the condition is masked
    assert specs[3]["grid"][0][1] is None
