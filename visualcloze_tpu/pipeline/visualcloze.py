"""VisualClozeModel: the end-to-end inference pipeline.

TPU-native counterpart of the reference pipeline (visualcloze.py:78-467):
grid preprocessing -> VAE encode -> token packing -> jit-compiled rectified
flow denoise -> decode -> crop -> optional SDEdit upsampling.

TPU-first design points:
  - the denoise loop is one compiled lax.scan program per (seq_len, steps)
    bucket; LoRA is folded into the weights at load time so the hot loop runs
    dense bf16 matmuls (models/lora.fold_lora),
  - VAE encode/decode and text encoders are jitted and cached per shape,
  - an optional (dp, fsdp, tp) mesh shards the DiT for multi-chip serving
    (the 12B model does not fit one v5e chip in bf16 — SURVEY.md §7),
  - seeded noise uses JAX PRNG (bitwise torch parity is impossible; fidelity
    is validated via injected-latent tests instead — SURVEY.md §7 RNG parity).
"""

from __future__ import annotations

import contextlib
import functools
import threading
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..config import AutoEncoderConfig, CLIPTextConfig, FluxConfig, T5Config, configs
from ..models.autoencoder import AutoEncoder
from ..models.flux import flux_apply
from ..models.sampling import prepare_modified
from ..ops.packing import pack_mask, patchify, unpatchify
from ..ops.schedule import ode_timesteps
from ..transport.sampling import denoise_ode
from . import preprocessing as pp

CONTENT_INSTRUCTIONS = [
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
    "In the last row, ",
    "The editing instruction in the last row is: ",
]


class VisualClozeModel:
    """API parity with the reference VisualClozeModel (visualcloze.py:79-145):
    construct, set_grid_size, process_images, upsampling.

    Components (flux params with LoRA already folded, AutoEncoder, text
    encoders) are injected or loaded via pipeline.loader.load_components.
    """

    def __init__(
        self,
        flux_cfg: FluxConfig,
        flux_params: dict,
        ae: AutoEncoder,
        t5,
        clip,
        *,
        resolution: int = 384,
        solver: str = "euler",
        time_shifting_factor: float = 1.0,
        attn_impl: str = "auto",
        max_length: int = 512,
        rope_layout: str = "half",
        adapters: dict[str, dict] | None = None,
        lora_scale: float = 1.0,
        permute_params: bool = True,
        hbm_serialize: bool = False,
    ):
        self.cfg = flux_cfg
        # permute_params=False: the caller guarantees flux_params already sit
        # in `rope_layout`'s channel order (checkpoint pre-permuted offline,
        # or random synthetic weights where any order IS a valid half layout)
        # — the permutation is a HOST-side pass, so skipping it keeps a
        # device-initialized 12 GB tree from round-tripping the host link.
        if rope_layout == "half" and permute_params:
            from ..models.weights import permute_rope_layout

            flux_params = permute_rope_layout(flux_params, flux_cfg)
        self.rope_layout = rope_layout
        self.params = flux_params
        # named runtime (unfolded) LoRA adapters, selectable per query —
        # multi-task serving without N folded weight trees. Same-structure
        # adapters share ONE compiled denoise program (the lora pytree is a
        # jit argument); capacity note in docs/SERVING.md.
        self.adapters: dict[str, dict] = {}
        self.lora_scale = lora_scale
        for name, tree in (adapters or {}).items():
            self.add_adapter(name, tree)
        self.ae = ae
        self.t5 = t5
        self.clip = clip
        self.resolution = resolution
        self.solver = solver
        self.time_shifting_factor = time_shifting_factor
        self.attn_impl = attn_impl
        self.max_length = max_length
        self.grid_h: int | None = None
        self.grid_w: int | None = None
        # Single-chip co-resident topology (int8 DiT + int4 T5 + CLIP + VAE
        # ~= 14 GiB on a 16 GiB chip): every enqueued XLA program reserves
        # its temp buffers at DISPATCH time, so back-to-back async enqueues
        # (two VAE encodes + T5 inside one prepare, or prepare overlapping a
        # denoise from another PipelinedServer thread) SUM their scratch and
        # blow the ~2 GiB of free HBM — measured RESOURCE_EXHAUSTED while
        # each program runs fine alone. hbm_serialize=True makes each stage
        # (a) take a process-wide device mutex and (b) fence (one-element
        # readback) before releasing it, so at most one program's temps are
        # ever live. Costs only tunnel RTTs: the chip serializes program
        # EXECUTION anyway, so steady-state throughput is unchanged.
        self.hbm_serialize = hbm_serialize
        self._device_mutex = threading.Lock()

        # AotJit == jax.jit until enable_aot() is called (serving daemons):
        # then each (bucket, adapter-signature) executable is serialized to
        # disk and a restart loads it instead of recompiling (pipeline/aot.py)
        from .aot import AotJit

        self._encode_jit = AotJit(
            lambda p, x, k: self._ae_with(p).encode(x, key=k), tag="vae_encode"
        )
        self._decode_jit = AotJit(
            lambda p, z: self._ae_with(p).decode(z), tag="vae_decode"
        )
        self._denoise_jit = AotJit(
            functools.partial(
                _denoise, self.cfg, attn_impl=self.attn_impl, rope_layout=rope_layout
            ),
            static_argnames=("method",),
            tag="denoise",
        )

    def enable_aot(self, cache_dir: str | None = None) -> str:
        """Serve-from-disk executables: persist every compiled denoise/VAE
        program under cache_dir (default $VISUALCLOZE_AOT_DIR) so the next
        process start skips XLA compilation. Call before warmup()."""
        from .aot import default_aot_dir

        cache_dir = cache_dir or default_aot_dir()
        for j in (self._encode_jit, self._decode_jit, self._denoise_jit):
            j.enable(cache_dir)
        return cache_dir

    def _ae_with(self, params):
        return AutoEncoder(self.ae.cfg, params)

    def _exclusive(self):
        """Device mutex for hbm_serialize mode (no-op context otherwise)."""
        return self._device_mutex if self.hbm_serialize else contextlib.nullcontext()

    def _fence(self, x) -> None:
        """hbm_serialize: force the program that produces `x` to finish (and
        its temps to be released) before the caller enqueues the next one.
        A one-element READBACK, not block_until_ready — over a buffering
        transport (axon tunnel) the latter can acknowledge at enqueue."""
        if not self.hbm_serialize:
            return
        for leaf in jax.tree_util.tree_leaves(x):
            # every jax leaf: one result dict can hold outputs of several
            # programs (e.g. prepare_modified: T5 + CLIP + packing), and a
            # fence on one program says nothing about the others
            if isinstance(leaf, jax.Array):
                np.asarray(jax.device_get(jnp.ravel(leaf)[:1]))

    def _retry_oom(self, fn, *args, **kwargs):
        """hbm_serialize: bounded retry on RESOURCE_EXHAUSTED. On a
        remote-attached device (axon tunnel) buffer FREES land a beat late —
        measured: a deleted 15.5 GiB probe buffer still blocked a 4-byte
        allocation issued right after — so with ~1.5 GiB of headroom a stage
        can transiently collide with the previous program's not-yet-released
        temps. Stage functions are pure jitted programs, so re-dispatch is
        safe; each retry syncs the stream (tiny readback) and backs off to
        let the frees land."""
        if not self.hbm_serialize:
            return fn(*args, **kwargs)
        import time

        last = None
        for attempt in range(5):
            try:
                out = fn(*args, **kwargs)
                # sync INSIDE the retry scope: dispatch is async, so an OOM'd
                # program only surfaces at the first readback — which must
                # happen here, not at some later caller, for retry to work
                self._fence(out)
                return out
            except jax.errors.JaxRuntimeError as e:  # pragma: no cover - device
                if "RESOURCE_EXHAUSTED" not in str(e):
                    raise
                last = e
                time.sleep(1.0 + 1.5 * attempt)
                try:  # flush the stream so pending frees are processed
                    np.asarray(jax.device_get(jnp.zeros((1,), jnp.float32)))
                except Exception:
                    pass
        raise last

    def add_adapter(self, name: str, lora: dict) -> None:
        """Register a runtime LoRA adapter (tree from models.lora.init_lora /
        weights.convert_lora / the diffusers converter). Applied un-folded at
        denoise time — the reference's FluxLoraWrapper runtime-add semantics
        (lora.py:92-98) — so one base tree serves many adapters."""
        if self.rope_layout == "half":
            from ..models.weights import permute_rope_layout_lora

            lora = permute_rope_layout_lora(lora, self.cfg)
        # commit converter-produced host numpy leaves to device arrays once,
        # instead of re-transferring the tree on every denoise call
        self.adapters[name] = jax.tree_util.tree_map(jnp.asarray, lora)

    def _resolve_adapter(self, name: str | None) -> dict | None:
        if name is None:
            return None
        if name not in self.adapters:
            raise ValueError(
                f"unknown adapter {name!r}; loaded: {sorted(self.adapters)}"
            )
        return self.adapters[name]

    # ----------------------------- public API -----------------------------

    def set_grid_size(self, h: int, w: int) -> None:
        self.grid_h = h
        self.grid_w = w

    def adapter_warm_set(self) -> list[str | None]:
        """[None] + one registered-adapter name per distinct jit signature.

        Adapters with the SAME signature (pytree structure + leaf shapes/
        dtypes — i.e. same rank and checkpoint coverage) share one compiled
        denoise program, so warming one representative covers them all; a
        rank-64 and a rank-256 adapter are different programs."""
        passes: list[str | None] = [None]
        seen: set = set()
        for name, tree in self.adapters.items():
            sig = (
                jax.tree_util.tree_structure(tree),
                tuple(
                    (x.shape, jnp.asarray(x).dtype)
                    for x in jax.tree_util.tree_leaves(tree)
                ),
            )
            if sig not in seen:
                seen.add(sig)
                passes.append(name)
        return passes

    def warmup(self, grid_shapes: list[tuple[int, int]], steps: int = 30,
               upsampling_steps: int = 10, upsampling_noise: float = 0.4,
               upsampling_sizes: list[tuple[int, int]] | None = None,
               warm_adapters: bool = True) -> None:
        """Pre-compile the denoise/encode/decode programs for the given
        (grid_h, grid_w) shapes plus the SDEdit stage (different seq len and
        step count — SURVEY.md §7 'SDEdit recompilation'). Serving setups call
        this once so first-request latency is steady-state.

        upsampling_sizes: extra (W, H) targets to pre-compile the SDEdit
        stage for — the in-grid pass only covers targets at `resolution`
        (the stage-2 sequence length follows the QUERY image's native size,
        so e.g. 1024x768 requests hit a different bucket)."""
        adapter_passes = self.adapter_warm_set() if warm_adapters else [None]
        for gh, gw in grid_shapes:
            self.set_grid_size(gh, gw)
            blank = Image.new("RGB", (self.resolution, self.resolution), (0, 0, 0))
            grid = [[blank] * gw for _ in range(gh)]
            grid[-1][-1] = None
            for adapter in adapter_passes:
                self.process_images(
                    grid, ["warmup", "", ""], seed=1, steps=steps,
                    upsampling_steps=upsampling_steps, upsampling_noise=upsampling_noise,
                    is_upsampling=True, adapter=adapter,
                )
        for w, h in upsampling_sizes or []:
            for adapter in adapter_passes:
                self.upsampling(
                    Image.new("RGB", (w, h), (0, 0, 0)), (w, h), cfg=30.0,
                    upsampling_steps=upsampling_steps,
                    upsampling_noise=upsampling_noise,
                    key=jax.random.PRNGKey(0), content_prompt="warmup",
                    adapter=adapter,
                )

    def calibrate_w8a8_smooth(
        self,
        queries: list[tuple[list, Sequence[str]]] | None = None,
        grid_size: tuple[int, int] = (2, 2),
        steps: int = 30,
        stride: int = 5,
        alpha: float = 0.5,
        seed: int = 1,
    ):
        """SmoothQuant calibration + quantization for w8a8 serving.

        Runs each query's full Euler denoise trajectory with the resident
        UNQUANTIZED params, collecting the per-input-channel absmax of every
        token-dim block linear's input at every `stride`-th step (plus the
        last), then swaps `self.params` for the equalized w8a8 tree
        (models/quant.quantize_flux_w8a8_smooth) — activation outliers
        migrate into the weights, so the per-token int8 grid stops being
        consumed by a handful of channels. Run where the bf16 tree fits (CPU
        host or a large chip); the resulting tree is what single-chip
        serving loads (pipeline/serving.save_params_dir).

        queries: list of (images, prompts) in process_images format;
        None calibrates on a blank demo grid (weight-aware but activation-
        distribution-approximate — prefer a few real queries). Returns the
        stats tree for inspection."""
        from ..models.quant import quantize_flux_w8a8_smooth

        if queries is None:
            gh, gw = grid_size
            blank = Image.new(
                "RGB", (self.resolution, self.resolution), (128, 128, 128)
            )
            grid = [[blank] * gw for _ in range(gh)]
            grid[-1][-1] = None
            queries = [(grid, ["calibration", "", ""])]
            grid_sizes = [grid_size]
        else:
            grid_sizes = [(len(im), len(im[0])) for im, _ in queries]

        stats = None

        # orchestrator._DEVICE_KEYS minus the per-step ("x", "ts") carries
        # (importing orchestrator here would be a module cycle)
        _DEV_KEYS = ("img_cond", "txt", "txt_ids", "txt_mask", "vec",
                     "img_ids", "img_mask", "guidance")

        def apply(params, x, t_vec, q, collect):
            inp = jnp.concatenate([x, q["img_cond"].astype(x.dtype)], axis=-1)
            return flux_apply(
                self.cfg, params, img=inp, img_ids=q["img_ids"],
                txt=q["txt"], txt_ids=q["txt_ids"], timesteps=t_vec,
                y=q["vec"], txt_mask=q["txt_mask"], img_mask=q["img_mask"],
                guidance=q["guidance"], attn_impl=self.attn_impl,
                rope_layout=self.rope_layout, collect_a8_stats=collect,
            )

        # two programs: non-collection steps skip the per-linear absmax
        # reduction tree entirely rather than computing and discarding it
        jfn_stats = jax.jit(functools.partial(apply, collect=True))
        jfn_plain = jax.jit(functools.partial(apply, collect=False))
        for (images, prompts), gs in zip(queries, grid_sizes):
            qfull = self.prepare_query(
                images, list(prompts), seed=seed, steps=steps, grid_size=gs
            )
            q = {k: qfull[k] for k in _DEV_KEYS}
            ts = np.asarray(qfull["ts"], np.float32)
            x = qfull["x"]
            n = len(ts) - 1
            for i in range(n):
                t_vec = jnp.full((x.shape[0],), float(ts[i]), dtype=x.dtype)
                if i % stride == 0 or i == n - 1:
                    v, st = jfn_stats(self.params, x, t_vec, q)
                    st = jax.device_get(st)
                    stats = (
                        st if stats is None else jax.tree.map(np.maximum, stats, st)
                    )
                else:
                    v = jfn_plain(self.params, x, t_vec, q)
                x = x + (float(ts[i + 1] - ts[i]) * v).astype(x.dtype)

        if stats is None:
            raise ValueError(
                "calibration collected no stats (need steps >= 1 and at "
                "least one query) — refusing to quantize unequalized"
            )
        self.params = quantize_flux_w8a8_smooth(self.params, stats, alpha)
        return stats

    def encode_row(self, row_img: np.ndarray, key: jax.Array) -> jnp.ndarray:
        """(H, W, 3) [-1,1] pixels -> (1, H/8, W/8, 16) scaled latent."""
        return self._retry_oom(
            self._encode_jit, self.ae.params, jnp.asarray(row_img)[None], key
        )

    def decode_latent(self, z: jnp.ndarray) -> np.ndarray:
        """(1, h, w, 16) scaled latent -> (H, W, 3) pixels in [0,1]."""
        with self._exclusive():
            # the full np.asarray readback doubles as the fence here
            def run(p, z):
                x = self._decode_jit(p, z)
                return np.asarray((np.asarray(x[0], np.float32) + 1.0) / 2.0)

            return self._retry_oom(run, self.ae.params, z)

    def process_images(
        self,
        images: list[list[Image.Image | None]],
        prompts: Sequence[str],
        seed: int = 0,
        cfg: float = 30.0,
        steps: int = 30,
        upsampling_steps: int = 10,
        upsampling_noise: float = 0.4,
        is_upsampling: bool = True,
        adapter: str | None = None,
    ) -> list[Image.Image]:
        """Generate the masked query cells (ref visualcloze.py:247-467).

        Composition of the three serving stages (prepare -> denoise ->
        finalize); pipeline.orchestrator runs the same stages on two chips
        with cross-query overlap. `adapter` selects a registered runtime
        LoRA (add_adapter) for both denoise stages.
        """
        q = self.prepare_query(images, prompts, seed=seed, cfg=cfg, steps=steps,
                               adapter=adapter)
        samples = self.denoise_query(q)
        return self.finalize_query(
            q, samples,
            upsampling_steps=upsampling_steps,
            upsampling_noise=upsampling_noise,
            is_upsampling=is_upsampling,
        )

    # ----------------------- staged serving API -----------------------

    def prepare_query(
        self,
        images: list[list[Image.Image | None]],
        prompts: Sequence[str],
        seed: int = 0,
        cfg: float = 30.0,
        steps: int = 30,
        grid_size: tuple[int, int] | None = None,
        adapter: str | None = None,
    ) -> dict[str, Any]:
        """Stage E1 (encoder chip): preprocess + VAE encode + T5/CLIP +
        packing. Returns everything the denoise stage needs plus the host
        metadata the finalize stage needs. Thread-safe when `grid_size` is
        passed explicitly (no dependence on set_grid_size state)."""
        self._resolve_adapter(adapter)  # fail on unknown names before any work
        if seed == 0:
            seed = int(np.random.randint(0, 2 ** 31 - 1))
        key = jax.random.PRNGKey(seed)

        grid_h, grid_w = grid_size if grid_size is not None else (self.grid_h, self.grid_w)
        assert grid_h is not None and grid_w is not None, "call set_grid_size first"

        processed, mask_position, target_size, upsampling_size = pp.preprocess_grid(
            images, grid_h, grid_w, self.resolution
        )
        row_images, row_masks = pp.build_grid_rows(processed, mask_position, grid_h, grid_w)

        # VAE-encode each row; pack cond latent + mask -> img_cond (1, L, 320)
        cond_tokens, mask_tokens, noise_rows, sizes = [], [], [], []
        with self._exclusive():
            for i, (row, mask) in enumerate(zip(row_images, row_masks)):
                key, ek, nk = jax.random.split(key, 3)
                lat = self.encode_row(row, ek)  # (1, h, w, 16)
                cond_tokens.append(patchify(lat.astype(jnp.bfloat16))[0])
                mask_tokens.append(
                    pack_mask(jnp.asarray(mask)[None].astype(jnp.bfloat16))[0]
                )
                h, w = row.shape[:2]
                sizes.append((h, w))
                noise = jax.random.normal(nk, lat.shape, dtype=jnp.float32)
                noise_rows.append(noise.astype(jnp.bfloat16))
            img_cond = jnp.concatenate(
                [
                    jnp.concatenate(cond_tokens, axis=0),
                    jnp.concatenate(mask_tokens, axis=0),
                ],
                axis=-1,
            )[None]

            true_len = sum(h * w // 256 for (h, w) in sizes)
            # bucket to the 128 lane width only: the flash kernel pads
            # internally to block multiples with bounded waste
            # (_choose_block), so the rest of the model runs at the minimal
            # token count — the flagship 2x3 grid (3456 img + 512 txt = 3968)
            # carries zero bucket padding where a 512-bucket added 128 dead
            # tokens to every matmul
            inp = self._retry_oom(
                prepare_modified,
                self.t5, self.clip, [noise_rows], [" ".join(prompts)],
                proportion_empty_prompts=0.0, bucket=128,
            )
        if inp["img"].shape[1] > true_len:
            # pad img_cond to the bucketed length too
            pad = inp["img"].shape[1] - true_len
            img_cond = jnp.pad(img_cond, ((0, 0), (0, pad), (0, 0)))

        ts = jnp.asarray(
            ode_timesteps(
                steps,
                true_len,  # schedule mu from the true token count (parity)
                do_shift=True,
                time_shifting_factor=self.time_shifting_factor,
            )
        )
        full = bool(np.asarray(inp["img_mask"]).all())
        return {
            # device arrays consumed by denoise_query
            "x": inp["img"].astype(jnp.bfloat16),
            "ts": ts,
            "img_cond": img_cond,
            "txt": inp["txt"].astype(jnp.bfloat16),
            "txt_ids": inp["txt_ids"],
            "txt_mask": None if full else inp["txt_mask"],
            "vec": inp["vec"].astype(jnp.bfloat16),
            "img_ids": inp["img_ids"],
            "img_mask": None if full else inp["img_mask"],
            "guidance": jnp.full((1,), cfg, jnp.bfloat16),
            # host metadata consumed by finalize_query
            "sizes": sizes,
            "mask_position": mask_position,
            "grid_w": grid_w,
            "upsampling_size": upsampling_size,
            "cfg": cfg,
            "key": key,
            "content_prompt": prompts[2] if len(prompts) > 2 else "",
            "adapter": adapter,
        }

    def denoise_query(self, q: dict[str, Any]) -> jnp.ndarray:
        """Stage D (DiT chip): the compiled 30-step rectified-flow loop."""
        lora = self._resolve_adapter(q.get("adapter"))
        with self._exclusive():
            def run():
                out = self._denoise_jit(
                    self.params, lora,
                    self.lora_scale if lora is not None else 1.0,
                    q["x"], q["ts"], q["img_cond"], q["txt"], q["txt_ids"],
                    q["txt_mask"], q["vec"], q["img_ids"], q["img_mask"],
                    q["guidance"], method=self.solver,
                )
                self._fence(out)
                return out

            return self._retry_oom(run)

    def finalize_query(
        self,
        q: dict[str, Any],
        samples: jnp.ndarray,
        upsampling_steps: int = 10,
        upsampling_noise: float = 0.4,
        is_upsampling: bool = True,
    ) -> list[Image.Image]:
        """Stage E2 (encoder chip): per-row decode, query-cell crop, optional
        SDEdit upsampling (which hops back to the DiT chip via upsampling)."""
        key = q["key"]

        # split per row, decode (ref visualcloze.py:419-434)
        output_rows = []
        start = 0
        for (h, w) in q["sizes"]:
            end = start + (h * w // 256)
            row_tok = samples[:, start:end]
            lat = unpatchify(row_tok, h // 8, w // 8)
            output_rows.append(pp.array_to_image(self.decode_latent(lat)))
            start = end

        # crop masked query cells (ref visualcloze.py:440-465)
        ret: list[Image.Image] = []
        last = output_rows[-1]
        ret_w, ret_h = last.width, last.height
        grid_w = q["grid_w"]
        for j in range(grid_w):
            if not q["mask_position"][j]:
                continue
            cropped = last.crop((j * ret_w // grid_w, 0, (j + 1) * ret_w // grid_w, ret_h))
            if is_upsampling:
                key, uk = jax.random.split(key)
                ret.append(
                    self.upsampling(
                        cropped, q["upsampling_size"], q["cfg"],
                        upsampling_steps=upsampling_steps,
                        upsampling_noise=upsampling_noise,
                        key=uk,
                        content_prompt=q["content_prompt"],
                        adapter=q.get("adapter"),
                    )
                )
            else:
                ret.append(cropped)
        return ret

    def upsampling(
        self,
        image: Image.Image,
        target_size: tuple[int, int] | None,
        cfg: float,
        upsampling_steps: int,
        upsampling_noise: float,
        key: jax.Array,
        content_prompt: str,
        adapter: str | None = None,
    ) -> Image.Image:
        """SDEdit stage-2 refinement (ref visualcloze.py:147-245)."""
        q = self.prepare_upsampling(
            image, target_size, cfg,
            upsampling_steps=upsampling_steps,
            upsampling_noise=upsampling_noise,
            key=key, content_prompt=content_prompt, adapter=adapter,
        )
        if isinstance(q, Image.Image):  # noise >= 1.0: plain resize
            return q
        samples = self.denoise_query(q)
        return self.finalize_upsampling(q, samples)

    def prepare_upsampling(
        self,
        image: Image.Image,
        target_size: tuple[int, int] | None,
        cfg: float,
        upsampling_steps: int,
        upsampling_noise: float,
        key: jax.Array,
        content_prompt: str,
        adapter: str | None = None,
    ) -> dict[str, Any] | Image.Image:
        """SDEdit stage E1: resize cap, re-encode, noise mix, packing.
        Returns the resized image directly when upsampling_noise >= 1.0
        (ref visualcloze.py:181-182)."""
        self._resolve_adapter(adapter)
        for c in CONTENT_INSTRUCTIONS:
            if content_prompt.startswith(c):
                content_prompt = content_prompt.replace(c, "")

        if target_size is None:
            target_size = (1024, 1024)
        if target_size[0] * target_size[1] > 1024 * 1024:
            aspect_ratio = target_size[0] / target_size[1]
            new_h = int((1024 * 1024 / aspect_ratio) ** 0.5)
            target_size = (int(new_h * aspect_ratio), new_h)
        image = image.resize(((target_size[0] // 16) * 16, (target_size[1] // 16) * 16))
        if upsampling_noise >= 1.0:
            return image

        arr = pp.image_to_array(image)
        key, ek, bk, nk = jax.random.split(key, 4)
        with self._exclusive():
            latent = self.encode_row(arr, ek)
            self._fence(latent)
            blank = self.encode_row(np.zeros_like(arr), bk)
            self._fence(blank)
            h, w = arr.shape[:2]
            mask = pack_mask(jnp.ones((1, h, w), jnp.bfloat16))
            latent_tok = patchify(latent.astype(jnp.bfloat16))
            blank_tok = patchify(blank.astype(jnp.bfloat16))
            img_cond = jnp.concatenate([blank_tok, mask], axis=-1)

            noise = jax.random.normal(
                nk, latent.shape, dtype=jnp.float32
            ).astype(jnp.bfloat16)
            inp = self._retry_oom(
                prepare_modified,
                self.t5, self.clip, [[noise]], [content_prompt],
                proportion_empty_prompts=0.0, bucket=128,
            )
            self._fence(inp["txt"])
        true_len = latent_tok.shape[1]
        if inp["img"].shape[1] > true_len:
            pad = inp["img"].shape[1] - true_len
            latent_tok = jnp.pad(latent_tok, ((0, 0), (0, pad), (0, 0)))
            img_cond = jnp.pad(img_cond, ((0, 0), (0, pad), (0, 0)))
        x = inp["img"] * (1.0 - upsampling_noise) + latent_tok * upsampling_noise

        ts = jnp.asarray(
            ode_timesteps(
                upsampling_steps,
                int(x.shape[1]),
                do_shift=False,
                strength=upsampling_noise,
                time_shifting_factor=1.0,
            )
        )
        # bucketing may have padded the single image's sequence: pass the
        # masks whenever padding exists (pad tokens must not attend — same
        # contract as process_images)
        full = bool(np.asarray(inp["img_mask"]).all())
        return {
            "x": x.astype(jnp.bfloat16),
            "ts": ts,
            "img_cond": img_cond,
            "txt": inp["txt"].astype(jnp.bfloat16),
            "txt_ids": inp["txt_ids"],
            "txt_mask": None if full else inp["txt_mask"],
            "vec": inp["vec"].astype(jnp.bfloat16),
            "img_ids": inp["img_ids"],
            "img_mask": None if full else inp["img_mask"],
            "guidance": jnp.full((1,), cfg, jnp.bfloat16),
            "true_len": true_len,
            "hw": (h, w),
            "adapter": adapter,
        }

    def finalize_upsampling(self, q: dict[str, Any], samples: jnp.ndarray) -> Image.Image:
        """SDEdit stage E2: unpatchify + decode."""
        h, w = q["hw"]
        lat = unpatchify(samples[:, : q["true_len"]], h // 8, w // 8)
        return pp.array_to_image(self.decode_latent(lat))


def _denoise(
    flux_cfg: FluxConfig,
    params: dict,
    lora: dict | None,
    lora_scale,
    x: jnp.ndarray,
    ts: jnp.ndarray,
    cond: jnp.ndarray,
    txt: jnp.ndarray,
    txt_ids: jnp.ndarray,
    txt_mask: jnp.ndarray,
    vec: jnp.ndarray,
    img_ids: jnp.ndarray,
    img_mask: jnp.ndarray,
    guidance: jnp.ndarray,
    method: str = "euler",
    attn_impl: str = "auto",
    rope_layout: str = "interleaved",
) -> jnp.ndarray:
    """The compiled hot loop: scan of Euler/Heun steps (or the adaptive
    dopri5 while_loop) over the full DiT."""

    def model_fn(img, timesteps, **_):
        return flux_apply(
            flux_cfg, params,
            img=img, img_ids=img_ids, txt=txt, txt_ids=txt_ids,
            timesteps=timesteps, y=vec, txt_mask=txt_mask, img_mask=img_mask,
            guidance=guidance, attn_impl=attn_impl, rope_layout=rope_layout,
            lora=lora, lora_scale=lora_scale,
        )

    if method == "dopri5":
        from ..transport.sampling import denoise_ode_adaptive

        return denoise_ode_adaptive(model_fn, x, ts[0], ts[-1], {}, cond=cond)
    return denoise_ode(model_fn, x, ts, {}, cond=cond, method=method)
