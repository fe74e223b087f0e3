"""Full-block-stack activation oracle: a tiny Flux forward computed by an
independent torch re-statement of the reference numerics
(visualcloze_tpu/models/torch_oracle.py) vs convert_flux -> flux_apply.

De-risks the unverifiable real-weight PSNR>40 gate (SURVEY §7 hard parts):
any converter transposition, modulation-chunk ordering, RoPE table/application
or stream-wiring bug shows up as a large activation diff here. The same
oracle powers scripts/validate_weights.py's conversion-fidelity gate on real
checkpoints.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from visualcloze_tpu.config import FluxConfig
from visualcloze_tpu.models.flux import flux_apply
from visualcloze_tpu.models.torch_oracle import (
    make_inputs,
    make_state,
    t_flux_forward,
)
from visualcloze_tpu.models.weights import convert_flux

CFG = FluxConfig().tiny()

def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a - b) ** 2))
    peak = float(np.max(np.abs(a))) or 1.0
    return 10.0 * math.log10(peak**2 / max(mse, 1e-20))


@pytest.fixture(scope="module")
def oracle_pair():
    state = make_state(CFG)
    params = convert_flux(state, CFG)
    return state, jax.tree.map(jnp.asarray, params)


def test_full_stack_matches_torch_oracle(oracle_pair):
    state, params = oracle_pair
    inp = make_inputs(CFG)
    with torch.no_grad():
        want = t_flux_forward(
            state, CFG, *(torch.from_numpy(inp[k]) for k in
                          ("img", "img_ids", "txt", "txt_ids", "timesteps", "y")),
            guidance=torch.from_numpy(inp["guidance"]),
        ).numpy()
    got = np.asarray(
        flux_apply(CFG, params, attn_impl="xla",
                   **{k: jnp.asarray(v) for k, v in inp.items()})
    )
    assert got.shape == want.shape
    assert psnr(got, want) > 40, psnr(got, want)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_full_stack_matches_torch_oracle_with_padding(oracle_pair):
    """Key-padding parity: compare activations at REAL positions (the
    reference's unpad/re-pad contract zeroes padded outputs; the kernel
    masks keys — either way real positions must agree)."""
    state, params = oracle_pair
    b, l_img, l_txt = 2, 48, 16
    inp = make_inputs(CFG, b=b, l_img=l_img, l_txt=l_txt)
    img_mask = np.ones((b, l_img), np.int32)
    img_mask[0, 40:] = 0
    txt_mask = np.ones((b, l_txt), np.int32)
    txt_mask[1, 12:] = 0
    with torch.no_grad():
        want = t_flux_forward(
            state, CFG, *(torch.from_numpy(inp[k]) for k in
                          ("img", "img_ids", "txt", "txt_ids", "timesteps", "y")),
            guidance=torch.from_numpy(inp["guidance"]),
            txt_mask=torch.from_numpy(txt_mask), img_mask=torch.from_numpy(img_mask),
        ).numpy()
    got = np.asarray(
        flux_apply(CFG, params, attn_impl="xla",
                   txt_mask=jnp.asarray(txt_mask), img_mask=jnp.asarray(img_mask),
                   **{k: jnp.asarray(v) for k, v in inp.items()})
    )
    real = img_mask.astype(bool)
    assert psnr(got[real], want[real]) > 40
    np.testing.assert_allclose(got[real], want[real], rtol=2e-3, atol=2e-3)


def test_rope_layout_permutation_matches_oracle(oracle_pair):
    """The offline 'half'-layout weight permutation keeps outputs identical
    to the torch oracle (serving path uses rope_layout='half')."""
    from visualcloze_tpu.models.weights import permute_rope_layout

    state, params = oracle_pair
    inp = make_inputs(CFG)
    with torch.no_grad():
        want = t_flux_forward(
            state, CFG, *(torch.from_numpy(inp[k]) for k in
                          ("img", "img_ids", "txt", "txt_ids", "timesteps", "y")),
            guidance=torch.from_numpy(inp["guidance"]),
        ).numpy()
    half_params = permute_rope_layout(params, CFG)
    got = np.asarray(
        flux_apply(CFG, half_params, attn_impl="xla", rope_layout="half",
                   **{k: jnp.asarray(v) for k, v in inp.items()})
    )
    assert psnr(got, want) > 40
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
