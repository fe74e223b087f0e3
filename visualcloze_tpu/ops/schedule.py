"""Rectified-flow timestep schedules and embeddings.

Pure functions; the numerics mirror the reference bit-for-bit where possible:
  - timestep_embedding    (models/modules/layers.py:28-49)
  - time_shift            (models/sampling.py:300-303; transport/utils.py:33-39)
  - get_lin_function      (models/sampling.py:306-311)
  - get_schedule          (models/sampling.py:314-328)
  - ode_timesteps         (transport/integrators.py:79-120 + transport.py:361-410)

Time convention: everywhere in this package `t` is "flux time" — t=1 is pure
noise, t=0 is data. The reference's transport/ package integrates in reversed
"ODE time" and double-flips inside time_shift / drift; we fold all flips away
(derivation: Sampler.sample_ode drift = -velocity(x, 1-t_ode) over t_ode:0->1
is identical to Euler in s=1-t_ode with x += (s_next - s_cur) * velocity(x, s),
the BFL `denoise` loop). The model always sees flux time.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def timestep_embedding(
    t: jnp.ndarray, dim: int, max_period: int = 10_000, time_factor: float = 1000.0
) -> jnp.ndarray:
    """Sinusoidal timestep embeddings; t is scaled by 1000 first.

    Args:
      t: (N,) fractional timesteps.
      dim: output channels.
    Returns: (N, dim) float32.
    """
    t = time_factor * t.astype(jnp.float32)
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def time_shift(mu: float, sigma: float, t):
    """Resolution shift in flux time (t=1 noise): exp(mu)/(exp(mu)+(1/t-1)^sigma).

    Works on numpy arrays / floats (host-side schedule construction) and on
    jnp arrays (training-time t shift).
    """
    return math.exp(mu) / (math.exp(mu) + (1.0 / t - 1.0) ** sigma)


def get_lin_function(x1: float = 256, y1: float = 0.5, x2: float = 4096, y2: float = 1.15):
    """Linear map seq_len -> mu: (256, 0.5) to (4096, 1.15)."""
    m = (y2 - y1) / (x2 - x1)
    b = y1 - m * x1
    return lambda x: m * x + b


def get_schedule(
    num_steps: int,
    image_seq_len: int,
    base_shift: float = 0.5,
    max_shift: float = 1.15,
    shift: bool = True,
) -> np.ndarray:
    """BFL schedule: num_steps+1 points from 1 to 0, optionally mu-shifted.

    Host-side numpy (static — feeds a jitted lax.scan).
    """
    timesteps = np.linspace(1.0, 0.0, num_steps + 1, dtype=np.float64)
    if shift:
        mu = get_lin_function(y1=base_shift, y2=max_shift)(image_seq_len)
        with np.errstate(divide="ignore"):
            timesteps = time_shift(mu, 1.0, timesteps)
        timesteps[-1] = 0.0
    return timesteps.astype(np.float32)


def ode_timesteps(
    num_points: int,
    image_seq_len: int,
    do_shift: bool = True,
    strength: float | None = None,
    time_shifting_factor: float | None = None,
) -> np.ndarray:
    """The transport-package sampling grid, expressed in flux time (1 -> 0).

    Mirrors transport/integrators.py:100-116 + transport/transport.py:395-396:
      - `num_points` grid points => num_points-1 Euler steps (torchdiffeq
        returns len(t) states; the reference pipeline's "30 steps" is 29
        integrator steps).
      - `strength` (SDEdit) shortens the interval: flux time starts at
        1 - strength instead of 1.
      - `time_shifting_factor` f warps ODE time t/(t+f-f*t) (f=1 is identity).
      - `do_shift` applies the mu(seq_len) resolution shift.

    Returns: (num_points,) float32, descending from start to 0.
    """
    t0, t1 = 0.0, 1.0
    if strength is not None:
        t0 = (t1 - t0) * strength + t0
    t_ode = np.linspace(t0, t1, num_points, dtype=np.float64)
    if time_shifting_factor:
        f = time_shifting_factor
        t_ode = t_ode / (t_ode + f - f * t_ode)
    s = 1.0 - t_ode  # flux time, descending
    if do_shift:
        mu = get_lin_function(y1=0.5, y2=1.15)(image_seq_len)
        with np.errstate(divide="ignore"):
            s = time_shift(mu, 1.0, s)
        s[np.isnan(s)] = 0.0
        s[-1] = 0.0
    return s.astype(np.float32)


def shift_training_time(t: jnp.ndarray, image_seq_len: int) -> jnp.ndarray:
    """Training-time resolution shift of sampled t (flux time).

    The reference samples t in its own convention and shifts with the
    double-reversed time_shift (transport/transport.py:123-127 +
    transport/utils.py:33-39); in flux time that collapses to the plain BFL
    law applied to t directly.
    """
    mu = get_lin_function(y1=0.5, y2=1.15)(image_seq_len)
    emu = math.exp(mu)
    return emu / (emu + (1.0 / t - 1.0))
