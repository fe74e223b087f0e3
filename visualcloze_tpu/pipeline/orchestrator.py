"""Disaggregated pipelined serving: encoder chip + DiT chip.

bench.py establishes the serving topology for the 12B model on 16 GB v5e
chips: T5-XXL bf16 (~9.5 GB) and the int8 12B DiT (~12 GB) cannot co-reside,
so production serving splits the encoders+VAE (chip E) from the DiT (chip D).
A single query's latency is the phase sum either way (its phases are
sequential), but THROUGHPUT need not pay the sum: with the stages pipelined,
query n+1's text/VAE encode and query n-1's decode run on chip E while query
n's denoise occupies chip D, so steady-state throughput approaches
1 / max(t_E, t_D) ≈ 1 / t_denoise instead of 1 / (t_text + t_vae + t_denoise).

This orchestrator drives the staged VisualClozeModel API
(prepare_query / denoise_query / finalize_query, and the SDEdit triple
prepare_upsampling / denoise_query / finalize_upsampling) from one thread per
in-flight query, with a host-side dispatch lock per chip; tokens hop between
chips via jax.device_put. Output parity with the sequential
process_images path is exact — same stage functions, same PRNG key schedule.

The reference has no serving orchestration at all (single-GPU eager pipeline,
visualcloze.py:247-467); this subsystem is TPU-motivated new capability.
"""

from __future__ import annotations

import threading
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Any, Sequence

import jax
from PIL import Image

from .visualcloze import VisualClozeModel

# the device arrays a query dict carries between chips
_DEVICE_KEYS = (
    "x", "ts", "img_cond", "txt", "txt_ids", "txt_mask",
    "vec", "img_ids", "img_mask", "guidance",
)


class ReplicaPool:
    """Least-loaded dispatch over N serving replicas (scale-out unit).

    Denoise latency is compute-bound and batch-insensitive (measured flat
    bs 1->4, docs/SERVING.md), so throughput scales by REPLICAS of the
    single- or two-chip serving unit, not by batching. Each replica is a
    PipelinedServer pinned to its own chip (pair); submit() routes to the
    replica with the fewest in-flight queries. Duck-types PipelinedServer's
    submit/close, so ServingFrontend (pipeline/server.py) serves a pool
    transparently.

    Failover: a query that fails on one replica is retried once per
    remaining replica (a crashed chip must not fail user queries while
    healthy replicas exist). A replica with `unhealthy_after` CONSECUTIVE
    failures stops receiving new queries until one of its retries succeeds
    (it is still tried last-resort when every replica is unhealthy, which
    doubles as its recovery probe). `health()` reports per-replica state."""

    def __init__(
        self,
        replicas: Sequence["PipelinedServer"],
        unhealthy_after: int = 3,
    ):
        if not replicas:
            raise ValueError("ReplicaPool needs at least one replica")
        self.replicas = list(replicas)
        self.unhealthy_after = unhealthy_after
        self._inflight = [0] * len(self.replicas)
        self._failures = [0] * len(self.replicas)  # consecutive
        self._lock = threading.Lock()

    def _pick(self, tried: set[int]) -> int | None:
        """Least-loaded among healthy untried replicas; any untried one when
        none are healthy; None when all have been tried."""
        with self._lock:
            untried = [i for i in range(len(self.replicas)) if i not in tried]
            if not untried:
                return None
            healthy = [
                i for i in untried if self._failures[i] < self.unhealthy_after
            ]
            pool = healthy or untried
            i = min(pool, key=self._inflight.__getitem__)
            self._inflight[i] += 1
            return i

    def _dispatch(self, out: Future, tried: set[int], args, kwargs) -> None:
        i = self._pick(tried)
        if i is None:  # defensive: callers check len(tried) before recursing
            if not out.done():
                out.set_exception(RuntimeError("no replica available"))
            return
        tried.add(i)
        try:
            inner = self.replicas[i].submit(*args, **kwargs)
        except Exception as err:
            # e.g. RuntimeError from a shut-down executor during drain — a
            # raise here runs inside submit() or a done-callback, where an
            # unhandled exception would leave `out` unresolved forever and
            # leak the _inflight slot; treat it like a failed query
            with self._lock:
                self._inflight[i] -= 1
                self._failures[i] += 1
                more = len(tried) < len(self.replicas)
            if more:
                self._dispatch(out, tried, args, kwargs)
            else:
                out.set_exception(err)
            return

        def _done(f: Future):
            with self._lock:
                self._inflight[i] -= 1
            err = f.exception()
            if err is None:
                with self._lock:
                    self._failures[i] = 0
                out.set_result(f.result())
                return
            if isinstance(err, ValueError):
                # client error (bad request/adapter): deterministic on every
                # replica — no retry, and it says nothing about chip health
                out.set_exception(err)
                return
            with self._lock:
                self._failures[i] += 1
                more = len(tried) < len(self.replicas)
            if more:
                self._dispatch(out, tried, args, kwargs)
            else:
                out.set_exception(err)

        inner.add_done_callback(_done)

    def submit(self, *args, **kwargs) -> Future:
        out: Future = Future()
        out.set_running_or_notify_cancel()
        self._dispatch(out, set(), args, kwargs)
        return out

    def health(self) -> list[dict[str, int | bool]]:
        """Per-replica snapshot for /healthz: in-flight load, consecutive
        failures, and whether the replica is in the dispatch set."""
        with self._lock:
            return [
                {
                    "in_flight": self._inflight[i],
                    "consecutive_failures": self._failures[i],
                    "healthy": self._failures[i] < self.unhealthy_after,
                }
                for i in range(len(self.replicas))
            ]

    def close(self) -> None:
        for r in self.replicas:
            r.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class PipelinedServer:
    """Two-chip pipelined serving over a staged VisualClozeModel.

    Args:
      model: a constructed VisualClozeModel (weights anywhere; they are moved).
      encoder_device: chip E — VAE + T5 + CLIP weights live here. None keeps
        them where they are (single-device operation still pipelines dispatch).
      dit_device: chip D — the (LoRA-folded, possibly int8) DiT weights.
      max_inflight: number of concurrently processed queries (pipeline depth;
        2 suffices to hide encode/decode under denoise).
    """

    def __init__(
        self,
        model: VisualClozeModel,
        encoder_device=None,
        dit_device=None,
        max_inflight: int = 2,
    ):
        self.model = model
        self.encoder_device = encoder_device
        self.dit_device = dit_device
        if dit_device is not None:
            model.params = jax.device_put(model.params, dit_device)
            # Runtime adapters feed the same denoise program — leaving them
            # as host numpy (the converters' output) would re-transfer the
            # whole adapter tree to the DiT chip on every call.
            model.adapters = {
                name: jax.device_put(tree, dit_device)
                for name, tree in getattr(model, "adapters", {}).items()
            }
        if encoder_device is not None:
            from ..models.autoencoder import AutoEncoder

            model.ae = AutoEncoder(
                model.ae.cfg, jax.device_put(model.ae.params, encoder_device)
            )
            if getattr(model.t5, "params", None) is not None:
                model.t5.params = jax.device_put(model.t5.params, encoder_device)
            if getattr(model.clip, "params", None) is not None:
                model.clip.params = jax.device_put(model.clip.params, encoder_device)
        # host-side dispatch locks, one per chip: JAX already serializes
        # execution per device; the locks keep one query's stage dispatch
        # contiguous so compilation-cache hits and transfers stay ordered.
        self._enc_lock = threading.Lock()
        self._dit_lock = threading.Lock()
        self._pool = ThreadPoolExecutor(max_workers=max_inflight)

    # ----------------------------- public API -----------------------------

    def submit(
        self,
        images: list[list[Image.Image | None]],
        prompts: Sequence[str],
        grid_size: tuple[int, int],
        seed: int = 0,
        cfg: float = 30.0,
        steps: int = 30,
        upsampling_steps: int = 10,
        upsampling_noise: float = 0.4,
        is_upsampling: bool = True,
        adapter: str | None = None,
    ) -> Future:
        """Enqueue one query; returns a Future of list[PIL.Image].

        grid_size is per-query (explicit (h, w)) — the server never touches
        the model's set_grid_size state, so concurrent queries with different
        grids are safe. `adapter` selects a registered runtime LoRA.
        """
        return self._pool.submit(
            self._run, images, prompts, grid_size, seed, cfg, steps,
            upsampling_steps, upsampling_noise, is_upsampling, adapter,
        )

    def close(self) -> None:
        self._pool.shutdown(wait=True)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ----------------------------- internals -----------------------------

    def _to(self, q: dict[str, Any], device) -> dict[str, Any]:
        if device is None:
            return q
        out = dict(q)
        for k in _DEVICE_KEYS:
            if out.get(k) is not None:
                out[k] = jax.device_put(out[k], device)
        return out

    def _denoise_on_dit(self, q: dict[str, Any]):
        qd = self._to(q, self.dit_device)
        with self._dit_lock:
            samples = self.model.denoise_query(qd)
            if self.encoder_device is not None:
                samples = jax.device_put(samples, self.encoder_device)
        return samples

    def _run(
        self, images, prompts, grid_size, seed, cfg, steps,
        upsampling_steps, upsampling_noise, is_upsampling, adapter=None,
    ) -> list[Image.Image]:
        m = self.model
        with self._enc_lock:
            q = m.prepare_query(
                images, prompts, seed=seed, cfg=cfg, steps=steps,
                grid_size=grid_size, adapter=adapter,
            )
        samples = self._denoise_on_dit(q)
        with self._enc_lock:
            crops = m.finalize_query(q, samples, is_upsampling=False)
        if not is_upsampling:
            return crops

        # SDEdit per masked cell: E (prepare) -> D (denoise) -> E (decode),
        # with the same key schedule as the sequential finalize_query path
        key = q["key"]
        out: list[Image.Image] = []
        for img in crops:
            key, uk = jax.random.split(key)
            with self._enc_lock:
                uq = m.prepare_upsampling(
                    img, q["upsampling_size"], cfg,
                    upsampling_steps=upsampling_steps,
                    upsampling_noise=upsampling_noise,
                    key=uk, content_prompt=q["content_prompt"],
                    adapter=q.get("adapter"),
                )
            if isinstance(uq, Image.Image):  # noise >= 1.0: plain resize
                out.append(uq)
                continue
            us = self._denoise_on_dit(uq)
            with self._enc_lock:
                out.append(m.finalize_upsampling(uq, us))
        return out
