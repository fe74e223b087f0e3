"""Pipelined disaggregated serving: two-chip placement + output parity.

The orchestrator (pipeline/orchestrator.py) runs the staged serving API
(prepare/denoise/finalize) with encoder components on one device and the DiT
on another, overlapping queries. These tests pin (a) exact output parity with
the sequential process_images path, (b) actual weight placement per chip,
(c) concurrent queries with different grid sizes (no set_grid_size races).
"""

import pytest

import jax
import numpy as np
from PIL import Image

from visualcloze_tpu.pipeline import PipelinedServer, random_components




def make_img(w, h, color):
    return Image.new("RGB", (w, h), color)


def _queries():
    q1 = dict(
        images=[
            [make_img(64, 64, (255, 0, 0)), make_img(64, 64, (0, 255, 0))],
            [make_img(64, 64, (0, 0, 255)), None],
        ],
        prompts=["layout", "task", "The content of the last image in the final row is: x"],
        grid_size=(2, 2),
        seed=7,
        steps=2,
    )
    q2 = dict(
        images=[[make_img(64, 64, (10, 200, 30)), make_img(64, 64, (200, 10, 30)), None]],
        prompts=["layout", "task", "content y"],
        grid_size=(1, 3),
        seed=11,
        steps=2,
    )
    return q1, q2


def test_pipelined_server_matches_sequential_and_places_weights():
    d0, d1 = jax.devices()[0], jax.devices()[1]
    q1, q2 = _queries()

    seq = random_components(jax.random.PRNGKey(0), tiny=True, resolution=64, attn_impl="xla")
    seq_out = []
    for q in (q1, q2):
        seq.set_grid_size(*q["grid_size"])
        seq_out.append(
            seq.process_images(
                q["images"], q["prompts"], seed=q["seed"], steps=q["steps"],
                is_upsampling=False,
            )
        )

    # identical weights (same PRNGKey), disaggregated placement
    model = random_components(jax.random.PRNGKey(0), tiny=True, resolution=64, attn_impl="xla")
    with PipelinedServer(model, encoder_device=d0, dit_device=d1) as server:
        futs = [
            server.submit(
                q["images"], q["prompts"], q["grid_size"], seed=q["seed"],
                steps=q["steps"], is_upsampling=False,
            )
            for q in (q1, q2)
        ]
        pipe_out = [f.result(timeout=600) for f in futs]

    # weights actually live on their chips
    flux_devs = {a.devices().pop() for a in jax.tree.leaves(model.params)}
    ae_devs = {a.devices().pop() for a in jax.tree.leaves(model.ae.params)}
    assert flux_devs == {d1}
    assert ae_devs == {d0}

    for seq_imgs, pipe_imgs in zip(seq_out, pipe_out):
        assert len(seq_imgs) == len(pipe_imgs)
        for a, b in zip(seq_imgs, pipe_imgs):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pipelined_server_upsampling_parity():
    """The SDEdit hop (E -> D -> E) reproduces the sequential key schedule."""
    d0, d1 = jax.devices()[0], jax.devices()[1]
    q1, _ = _queries()

    seq = random_components(jax.random.PRNGKey(0), tiny=True, resolution=64, attn_impl="xla")
    seq.set_grid_size(*q1["grid_size"])
    want = seq.process_images(
        q1["images"], q1["prompts"], seed=q1["seed"], steps=q1["steps"],
        upsampling_steps=2, upsampling_noise=0.4, is_upsampling=True,
    )

    model = random_components(jax.random.PRNGKey(0), tiny=True, resolution=64, attn_impl="xla")
    with PipelinedServer(model, encoder_device=d0, dit_device=d1) as server:
        got = server.submit(
            q1["images"], q1["prompts"], q1["grid_size"], seed=q1["seed"],
            steps=q1["steps"], upsampling_steps=2, upsampling_noise=0.4,
            is_upsampling=True,
        ).result(timeout=600)

    assert len(want) == len(got)
    for a, b in zip(want, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


pytestmark = pytest.mark.slow  # 8-device mesh / full-stack CLI suite; fast lane skips


def test_replica_pool_routes_least_loaded_and_matches():
    """ReplicaPool over two replicas: concurrent queries spread across both,
    every result matches the sequential path (same per-replica weights)."""
    from visualcloze_tpu.pipeline import ReplicaPool

    q1, q2 = _queries()
    seq = random_components(jax.random.PRNGKey(0), tiny=True, resolution=64,
                            attn_impl="xla")
    seq.set_grid_size(*q1["grid_size"])
    want = seq.process_images(
        q1["images"], q1["prompts"], seed=q1["seed"], steps=q1["steps"],
        is_upsampling=False,
    )

    replicas = [
        PipelinedServer(
            random_components(jax.random.PRNGKey(0), tiny=True, resolution=64,
                              attn_impl="xla"),
            max_inflight=1,
        )
        for _ in range(2)
    ]
    with ReplicaPool(replicas) as pool:
        futs = [
            pool.submit(q1["images"], q1["prompts"], grid_size=q1["grid_size"],
                        seed=q1["seed"], steps=q1["steps"], is_upsampling=False)
            for _ in range(4)
        ]
        outs = [f.result() for f in futs]
    for out in outs:
        np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(want[0]))
    assert all(n == 0 for n in pool._inflight)
