"""x_distortion severity-table parity vs the reference toolkit.

The reference's data/degradation_toolkit/x_distortion/ package parameterizes
36 distortion subtypes by severity-1..5 tables (cited from KADID-10K /
Imagecorruptions / PieAPP). Restoration-task training parity requires the
same (family -> subtype, severity -> parameters) distribution, so these tests
AST-extract the reference tables and compare them key-for-key against
visualcloze_tpu.data.x_distortion.SEVERITY_TABLES — the same strategy
test_data.py uses for the prompt registries.
"""

import ast
import pathlib

import numpy as np
import pytest

from visualcloze_tpu.data.x_distortion import (
    DISTORTION_FAMILIES,
    SEVERITY_TABLES,
    SUBTYPES,
    add_x_distortion,
)

REF_DIR = pathlib.Path("/root/reference/data/degradation_toolkit/x_distortion")

REF_MODULE_OF = {
    "blur": "blur.py",
    "noise": "noise.py",
    "compression": "compression.py",
    "brightness": "brightness.py",
    "contrast": "contrast.py",
    "saturate": "saturate.py",
    "oversharpen": "oversharpen.py",
    "pixelate": "pixelate.py",
    "quantization": "quantization.py",
    "spatter": "spatter.py",
}


def _module_for(subtype: str) -> str:
    return REF_MODULE_OF[subtype.split("_")[0]]


def _eval_node(node):
    """Evaluate the restricted expression grammar the reference tables use:
    constants, tuples, unary minus, and np.arange(...) calls."""
    if isinstance(node, ast.Constant):
        return node.value
    if isinstance(node, ast.Tuple):
        return tuple(_eval_node(e) for e in node.elts)
    if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.USub):
        return -_eval_node(node.operand)
    if (
        isinstance(node, ast.Call)
        and isinstance(node.func, ast.Attribute)
        and node.func.attr == "arange"
    ):
        return np.arange(*[_eval_node(a) for a in node.args])
    raise ValueError(ast.dump(node))


def _is_severity_subscript(node) -> bool:
    """Matches `<list>[severity - 1]` / `<list>[severity-1]`."""
    s = node.slice
    return (
        isinstance(s, ast.BinOp)
        and isinstance(s.op, ast.Sub)
        and isinstance(s.left, ast.Name)
        and s.left.id == "severity"
        and isinstance(s.right, ast.Constant)
        and s.right.value == 1
    )


def _reference_tables(subtype: str) -> list[list]:
    """All 5-entry tables subscripted by severity-1 inside the reference
    function body, in source order."""
    tree = ast.parse((REF_DIR / _module_for(subtype)).read_text())
    fn = next(
        n for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name == subtype
    )
    tables = []
    for node in ast.walk(fn):
        if (
            isinstance(node, ast.Subscript)
            and isinstance(node.value, ast.List)
            and len(node.value.elts) == 5
            and _is_severity_subscript(node)
        ):
            tables.append([_eval_node(e) for e in node.value.elts])
    assert tables, f"no severity table found in reference {subtype}"
    return tables


def _flat(entry):
    return np.concatenate([np.ravel(np.asarray(x, np.float64)) for x in entry]) \
        if isinstance(entry, (tuple, list, np.ndarray)) else np.array([entry], np.float64)


def test_family_registry_matches_reference_key_for_key():
    tree = ast.parse((REF_DIR / "__init__.py").read_text())
    ref = next(
        ast.literal_eval(n.value)
        for n in tree.body
        if isinstance(n, ast.Assign)
        and isinstance(n.targets[0], ast.Name)
        and n.targets[0].id == "distortions_dict"
    )
    assert DISTORTION_FAMILIES == ref


@pytest.mark.parametrize("subtype", sorted(SEVERITY_TABLES))
def test_severity_tables_match_reference(subtype):
    ref_tables = _reference_tables(subtype)
    ours = SEVERITY_TABLES[subtype]
    assert len(ours) == len(ref_tables), (
        f"{subtype}: {len(ours)} tables here vs {len(ref_tables)} in reference"
    )
    for our_tab, ref_tab in zip(ours, ref_tables):
        for sev in range(5):
            np.testing.assert_allclose(
                _flat(our_tab[sev]), _flat(ref_tab[sev]),
                err_msg=f"{subtype} severity {sev + 1}",
            )


def test_all_subtypes_covered():
    ref_names = {n for fam in DISTORTION_FAMILIES.values() for n in fam}
    assert set(SEVERITY_TABLES) == ref_names == set(SUBTYPES)


@pytest.mark.parametrize("subtype", sorted(SUBTYPES))
def test_every_subtype_runs_at_every_severity(subtype):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    for sev in (1, 3, 5):
        out = SUBTYPES[subtype](img, sev, np.random.default_rng(sev))
        assert out.shape == img.shape and out.dtype == np.uint8, (subtype, sev)


def test_severity_monotone_for_gaussian_noise():
    img = np.full((64, 64, 3), 128, np.uint8)
    errs = [
        np.abs(SUBTYPES["noise_gaussian_RGB"](img, s, np.random.default_rng(0)).astype(int)
               - 128).mean()
        for s in (1, 3, 5)
    ]
    assert errs[0] < errs[1] < errs[2], errs


def test_family_draw_protocol(monkeypatch):
    """severity uniform on 1..5 (capped at 3 for compression/quantization),
    subtype uniform within the family (ref degradation_utils.py:83-97)."""
    img = np.random.default_rng(0).integers(0, 256, (48, 48, 3), dtype=np.uint8)
    out = add_x_distortion(img, "compression", np.random.default_rng(1))
    assert out.shape == img.shape
    # explicit severity passes through the cap
    out = add_x_distortion(img, "quantization", np.random.default_rng(2), severity=5,
                           subtype="quantization_hist")
    assert out.shape == img.shape
    with pytest.raises(KeyError):
        add_x_distortion(img, "not_a_family", np.random.default_rng(3))


def test_dispatcher_routes_families_through_x_distortion():
    """The degradation registry's family keys draw severity-graded
    x_distortion subtypes (the reference's training distribution)."""
    from visualcloze_tpu.data.degradations import add_degradation

    img = np.random.default_rng(5).integers(0, 256, (48, 48, 3), dtype=np.uint8)
    for family in DISTORTION_FAMILIES:
        out = add_degradation(img, family, np.random.default_rng(7))
        assert out.shape == img.shape and out.dtype == np.uint8, family
