"""Rectified-flow transport: training losses and model-output conversions.

TPU-native counterpart of the reference Transport class
(transport/transport.py:43-247). The reference juggles three time conventions
(data-time paths, flux-time model, reversed ODE-time integrators) with sign
flips at each boundary; here *everything the model and samplers see is flux
time* (t=1 noise, t=0 data) and only the path-plan calls convert (u = 1 - t).
Equivalence to the reference's double-flipped pipeline is covered by tests
(tests/test_transport.py).

All entry points are pure functions of explicit PRNG keys — jit/grad/vmap
compose freely.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from ..ops.schedule import shift_training_time
from . import path as path_mod


class ModelType(enum.Enum):
    NOISE = enum.auto()
    SCORE = enum.auto()
    VELOCITY = enum.auto()


class PathType(enum.Enum):
    LINEAR = enum.auto()
    GVP = enum.auto()
    VP = enum.auto()


_PATHS = {
    PathType.LINEAR: path_mod.ICPlan,
    PathType.GVP: path_mod.GVPCPlan,
    PathType.VP: path_mod.VPCPlan,
}


@dataclass(frozen=True)
class Transport:
    """Static transport configuration (ref transport.py:43-62)."""

    model_type: ModelType = ModelType.VELOCITY
    path_type: PathType = PathType.LINEAR
    train_eps: float = 0.0
    sample_eps: float = 0.0
    snr_type: str = "uniform"
    do_shift: bool = True

    @property
    def path(self):
        return _PATHS[self.path_type]()

    # ----------------------------- training -----------------------------

    def sample_t(self, key: jax.Array, batch: int, image_seq_len: int, snr_type: str | None = None) -> jnp.ndarray:
        """Sample flux-time t (ref transport.py:98-130 `Transport.sample`).

        uniform / uniform_a_b / lognorm, then the resolution-aware shift.
        (The sigmoid-of-normal lognorm draw is symmetric, so sampling directly
        in flux time matches the reference's data-time draw in distribution.)
        """
        snr_type = snr_type or self.snr_type
        t0, t1 = 0.0, 1.0
        if snr_type.startswith("uniform"):
            if "_" in snr_type:
                _, a, b = snr_type.split("_")
                t0, t1 = float(a), float(b)
            t = jax.random.uniform(key, (batch,)) * (t1 - t0) + t0
        elif snr_type == "lognorm":
            u = jax.random.normal(key, (batch,))
            t = jax.nn.sigmoid(u) * (t1 - t0) + t0
        else:
            raise NotImplementedError(f"snr_type {snr_type}")
        if self.do_shift:
            t = shift_training_time(t, image_seq_len)
        return t

    def training_losses(
        self,
        model_fn,
        key: jax.Array,
        x1: jnp.ndarray,
        model_kwargs: dict | None = None,
        cond: jnp.ndarray | None = None,
        img_mask: jnp.ndarray | None = None,
        t: jnp.ndarray | None = None,
        noise: jnp.ndarray | None = None,
    ) -> dict:
        """Masked velocity-matching loss (ref transport.py:132-176).

        Args:
          model_fn: callable(img, timesteps, **model_kwargs) -> velocity
            tokens, in flux time.
          x1: (B, L, D) clean data tokens.
          cond: (B, L, C) conditioning tokens concatenated on channels.
          img_mask: (B, L) {1 real, 0 pad}; loss normalized per real token.
          t/noise: optional injected values (testing seams).

        Returns dict(loss (B,), task_loss (B,), t (B,)).
        """
        model_kwargs = dict(model_kwargs or {})
        k_t, k_n = jax.random.split(key)
        if t is None:
            t = self.sample_t(k_t, x1.shape[0], x1.shape[1])
        if noise is None:
            noise = jax.random.normal(k_n, x1.shape, dtype=jnp.float32).astype(x1.dtype)
        x0 = noise

        u = 1.0 - t  # data time for the path plan
        xt = self.path.compute_xt(u, x0, x1)
        # flux-time velocity target: d x / d t_flux = -ut_data
        target = -self.path.compute_ut(u, x0, x1)

        model_in = jnp.concatenate([xt, cond], axis=-1) if cond is not None else xt
        pred = model_fn(model_in, timesteps=t, **model_kwargs)

        if self.model_type != ModelType.VELOCITY:
            raise NotImplementedError("training supports velocity prediction (reference parity)")

        diff = (pred - target).astype(jnp.float32)
        if img_mask is not None:
            d = diff.shape[-1]
            diff = diff * img_mask[..., None]
            denom = img_mask.sum(axis=1).astype(jnp.float32) * d
            task_loss = jnp.square(diff).sum(axis=(1, 2)) / denom
        else:
            task_loss = jnp.mean(jnp.square(diff), axis=tuple(range(1, diff.ndim)))
        return {"loss": task_loss, "task_loss": jax.lax.stop_gradient(task_loss), "t": t}

    # ----------------------------- conversions -----------------------------

    def velocity_from_model(self, model_out, x, t):
        """Map the model's prediction type to flux-time velocity at flux t."""
        u = 1.0 - t
        if self.model_type == ModelType.VELOCITY:
            return model_out
        if self.model_type == ModelType.SCORE:
            # data-time velocity from score, then flip sign for flux time
            return -self.path.get_velocity_from_score(model_out, x, u)
        if self.model_type == ModelType.NOISE:
            sigma_t, _ = self.path.compute_sigma_t(path_mod.expand_t(u, x))
            score = model_out / -sigma_t
            return -self.path.get_velocity_from_score(score, x, u)
        raise NotImplementedError(self.model_type)

    def score_from_velocity(self, velocity_flux, x, t):
        """Score at flux time t from a flux-time velocity prediction."""
        u = 1.0 - t
        return self.path.get_score_from_velocity(-velocity_flux, x, u)


def create_transport(
    path_type: str = "Linear",
    prediction: str = "velocity",
    loss_weight=None,
    train_eps: float | None = None,
    sample_eps: float | None = None,
    snr_type: str = "uniform",
    do_shift: bool = True,
) -> Transport:
    """Factory mirroring the reference create_transport (transport/__init__.py:4-62)."""
    model_type = {
        "noise": ModelType.NOISE,
        "score": ModelType.SCORE,
        "velocity": ModelType.VELOCITY,
    }[prediction]
    ptype = {"Linear": PathType.LINEAR, "GVP": PathType.GVP, "VP": PathType.VP}[path_type]
    if ptype == PathType.VP:
        train_eps = 1e-5 if train_eps is None else train_eps
        sample_eps = 1e-3 if sample_eps is None else sample_eps
    elif model_type != ModelType.VELOCITY:
        train_eps = 1e-3 if train_eps is None else train_eps
        sample_eps = 1e-3 if sample_eps is None else sample_eps
    else:
        train_eps, sample_eps = 0.0, 0.0
    return Transport(
        model_type=model_type,
        path_type=ptype,
        train_eps=train_eps,
        sample_eps=sample_eps,
        snr_type=snr_type,
        do_shift=do_shift,
    )
