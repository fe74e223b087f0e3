"""Flow samplers: jit-compiled `lax.scan` integrators.

TPU-native replacement for the reference's torchdiffeq hot loop
(transport/integrators.py:79-120 + transport/transport.py:252-410,
SURVEY.md §2.9 item 7): the timestep grid is precomputed host-side
(ops/schedule.ode_timesteps folds away the reference's time double-flips) and
the whole denoise loop is ONE compiled XLA program — no per-step dispatch,
no host sync.

Conventions: flux time (t=1 noise); the model predicts flux-time velocity;
Euler step x += (t_next - t_cur) * v. `num_steps` grid points perform
num_steps-1 integrator steps, matching torchdiffeq-on-a-grid semantics.
"""

from __future__ import annotations

import re
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.schedule import ode_timesteps
from .transport import Transport

ModelFn = Callable[..., jnp.ndarray]

_SOLVER_RE = re.compile(r"euler|heun|ab2|dopri5|cached(?::[1-9]\d*)?")


def solver_arg(name: str) -> str:
    """argparse ``type=`` validator for --solver flags: accepts every method
    denoise_ode/sample_ode implement — euler / heun / ab2 / dopri5 /
    cached[:K] for any K >= 1 — instead of a hardcoded choices list."""
    if not _SOLVER_RE.fullmatch(name):
        raise ValueError(
            f"unknown solver {name!r}; expected euler, heun, ab2, dopri5, "
            "or cached[:K] with integer K >= 1"
        )
    return name


def denoise_ode(
    model_fn: ModelFn,
    x: jnp.ndarray,
    timesteps: jnp.ndarray,
    model_kwargs: dict[str, Any],
    cond: jnp.ndarray | None = None,
    method: str = "euler",
) -> jnp.ndarray:
    """Integrate dx/dt = v(x, t) over a descending flux-time grid.

    Args:
      model_fn: callable(img, timesteps=(B,), **model_kwargs) -> velocity.
      x: (B, L, D) initial noise tokens.
      timesteps: (N,) descending grid (from ops.schedule.ode_timesteps).
      cond: optional (B, L, C) channel-concatenated conditioning
        (transport.py:193-198 velocity_ode).
      method: "euler" (reference default), "heun" (2nd order, 2 evals/step),
        "ab2" (Adams–Bashforth 2 on the nonuniform shifted grid: 2nd
        order at ONE model eval per step — the training-free fast-solver
        family of PAPERS.md "Leveraging Previous Steps" applied TPU-style,
        as a multistep scan carry instead of a solver cache), or
        "cached[:K]" (velocity-cache serving mode: model evals only every
        K-th step + the last, linear-in-t extrapolation between refreshes —
        ~K-fold fewer DiT calls on the same step grid).

    Returns final x.
    """
    b = x.shape[0]

    def velocity(x, t):
        t_vec = jnp.full((b,), t, dtype=x.dtype)
        inp = jnp.concatenate([x, cond.astype(x.dtype)], axis=-1) if cond is not None else x
        return model_fn(inp, timesteps=t_vec, **model_kwargs)

    pairs = jnp.stack([timesteps[:-1], timesteps[1:]], axis=1)

    if method == "euler":
        def step(x, pair):
            t_cur, t_next = pair[0], pair[1]
            v = velocity(x, t_cur)
            dt = (t_next - t_cur).astype(x.dtype)
            return x + dt * v.astype(x.dtype), None
    elif method == "heun":
        def step(x, pair):
            t_cur, t_next = pair[0], pair[1]
            dt = (t_next - t_cur).astype(x.dtype)
            v1 = velocity(x, t_cur).astype(x.dtype)
            x_mid = x + dt * v1
            v2 = velocity(x_mid, t_next).astype(x.dtype)
            return x + dt * 0.5 * (v1 + v2), None
    elif method == "ab2":
        # nonuniform-step Adams–Bashforth 2: one model eval per step,
        # x_{n+1} = x_n + h_n [(1 + r/2) v_n - (r/2) v_{n-1}], r = h_n/h_{n-1}
        # (first interval bootstraps with Heun so the whole scheme stays
        # 2nd order). Same per-step cost as euler, one extra eval total.
        t0, t1 = timesteps[0], timesteps[1]
        h0 = (t1 - t0).astype(jnp.float32)
        v0 = velocity(x, t0).astype(jnp.float32)
        x32 = x.astype(jnp.float32)
        x_pred = x32 + h0 * v0
        v0b = velocity(x_pred.astype(x.dtype), t1).astype(jnp.float32)
        x32 = x32 + h0 * 0.5 * (v0 + v0b)

        def step(carry, pair):
            xc, v_prev, h_prev = carry
            t_cur, t_next = pair[0], pair[1]
            h = (t_next - t_cur).astype(jnp.float32)
            v = velocity(xc.astype(x.dtype), t_cur).astype(jnp.float32)
            r = h / h_prev
            xc = xc + h * ((1.0 + 0.5 * r) * v - 0.5 * r * v_prev)
            return (xc, v, h), None

        # carry v_prev = v(t0): the first AB2 step over [t1, t2] pairs its
        # fresh v(t1) with the true previous-node velocity
        (x32, _, _), _ = jax.lax.scan(step, (x32, v0, h0), pairs[1:])
        return x32.astype(x.dtype)
    elif method.startswith("cached"):
        # Training-free velocity-cache serving mode (the FORA/TeaCache family
        # of DiT accelerators, PAPERS.md "VDE"): the model is evaluated only on
        # a static refresh schedule — every k-th integrator step plus the final
        # one — and the skipped steps advance with the velocity linearly
        # EXTRAPOLATED in t from the last two evals (exact whenever v is affine
        # in t along the trajectory; a strictly better reuse rule than holding
        # v constant). The schedule is data-independent, so the whole loop is
        # still ONE compiled scan: each step's lax.cond runs either the full
        # DiT or a 3-op extrapolation, cutting wall-clock by ~(k-1)/k of the
        # denoise. Spelled "cached" (k=2) or "cached:K". Quality is
        # checkpoint-dependent — gated like the quantized modes
        # (docs/ROADMAP.md); the mechanism itself is exactness-tested.
        m = re.fullmatch(r"cached(?::(\d+))?", method)
        if m is None:
            raise NotImplementedError(f"ODE method {method!r}")
        k_every = int(m.group(1) or 2)
        if k_every < 1:
            raise NotImplementedError(
                f"ODE method {method!r}: cached:K requires K >= 1 "
                "(K=1 is plain euler; K>=2 skips model evals)"
            )
        n_steps = int(pairs.shape[0])
        fresh = np.zeros((n_steps,), dtype=bool)
        fresh[: min(2, n_steps)] = True  # bootstrap: two real evals before any
        fresh[1::k_every] = True         # skip, so extrapolation is never a
        fresh[-1] = True                 # zeroth-order hold; refresh the last
        #                                  step — it shapes the fine detail

        t0 = timesteps[0].astype(jnp.float32)
        v0 = velocity(x, timesteps[0]).astype(jnp.float32)
        x32 = x.astype(jnp.float32) + (timesteps[1].astype(jnp.float32) - t0) * v0
        if n_steps == 1:
            return x32.astype(x.dtype)
        # (v1, t1) newest eval, (v2, t2) the one before; v2 = v1 at init makes
        # the pre-second-eval extrapolation slope exactly zero (plain reuse).
        carry0 = (x32, v0, t0, v0, t0 + 1.0)

        def step(carry, inputs):
            pair, is_fresh = inputs
            t_cur = pair[0].astype(jnp.float32)
            t_next = pair[1].astype(jnp.float32)

            def eval_branch(op):
                xc, v1, t1, v2, t2 = op
                v = velocity(xc.astype(x.dtype), t_cur).astype(jnp.float32)
                return v, v, t_cur, v1, t1

            def reuse_branch(op):
                xc, v1, t1, v2, t2 = op
                v = v1 + (v1 - v2) * ((t_cur - t1) / (t1 - t2))
                return v, v1, t1, v2, t2

            v, v1, t1, v2, t2 = jax.lax.cond(is_fresh, eval_branch, reuse_branch, carry)
            xc = carry[0] + (t_next - t_cur) * v
            return (xc, v1, t1, v2, t2), None

        (x32, *_), _ = jax.lax.scan(step, carry0, (pairs[1:], jnp.asarray(fresh[1:])))
        return x32.astype(x.dtype)
    else:
        raise NotImplementedError(f"ODE method {method!r}")

    x, _ = jax.lax.scan(step, x, pairs)
    return x


#   Dormand-Prince 5(4) tableau (the reference's torchdiffeq dopri5 option,
#   transport/integrators.py:119). FSAL: stage 7 is the next step's stage 1.
_DOPRI_C = np.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_DOPRI_A = [
    np.array([1 / 5]),
    np.array([3 / 40, 9 / 40]),
    np.array([44 / 45, -56 / 15, 32 / 9]),
    np.array([19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729]),
    np.array([9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656]),
    np.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84]),
]
_DOPRI_B5 = np.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0])
_DOPRI_B4 = np.array(
    [5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200, 187 / 2100, 1 / 40]
)


def denoise_ode_adaptive(
    model_fn: ModelFn,
    x: jnp.ndarray,
    t_start: float,
    t_end: float,
    model_kwargs: dict[str, Any],
    cond: jnp.ndarray | None = None,
    atol: float = 1e-6,
    rtol: float = 1e-3,
    max_steps: int = 256,
) -> jnp.ndarray:
    """Adaptive Dormand-Prince 5(4) from flux time t_start down to t_end,
    as ONE compiled lax.while_loop (PI-free I step control, FSAL reuse).

    max_steps caps trial steps (accepted + rejected) so the program is
    bounded; integration clamps the final step onto t_end exactly.
    """
    b = x.shape[0]

    def f(x32, t):
        t_vec = jnp.full((b,), t, dtype=x.dtype)
        xi = x32.astype(x.dtype)
        inp = jnp.concatenate([xi, cond.astype(x.dtype)], axis=-1) if cond is not None else xi
        return model_fn(inp, timesteps=t_vec, **model_kwargs).astype(jnp.float32)

    t_start = jnp.float32(t_start)
    t_end = jnp.float32(t_end)
    direction = jnp.where(t_end < t_start, -1.0, 1.0)  # traced-endpoint safe
    span = jnp.abs(t_end - t_start)
    x0 = x.astype(jnp.float32)
    state = (
        x0,
        t_start,
        jnp.float32(direction * span / 16.0),  # initial trial step
        f(x0, t_start),                        # FSAL k1
        jnp.int32(0),
    )

    def cond_fn(state):
        _, t, _, _, n = state
        return (jnp.abs(t - t_end) > 1e-7) & (n < max_steps)

    def body(state):
        x32, t, dt, k1, n = state
        # clamp onto the endpoint
        dt = direction * jnp.minimum(jnp.abs(dt), jnp.abs(t_end - t))
        ks = [k1]
        for i, row in enumerate(_DOPRI_A):
            xi = x32 + dt * sum(float(c) * k for c, k in zip(row, ks))
            ks.append(f(xi, t + float(_DOPRI_C[i + 1]) * dt))
        x5 = x32 + dt * sum(float(c) * k for c, k in zip(_DOPRI_B5, ks))
        err = dt * sum(float(c5 - c4) * k for c5, c4, k in zip(_DOPRI_B5, _DOPRI_B4, ks))
        tol = atol + rtol * jnp.maximum(jnp.abs(x32), jnp.abs(x5))
        err_norm = jnp.sqrt(jnp.mean(jnp.square(err / tol)))
        accept = err_norm <= 1.0  # False on NaN: a NaN step is never accepted
        factor = jnp.where(
            jnp.isfinite(err_norm),
            jnp.clip(0.9 * jnp.power(jnp.maximum(err_norm, 1e-10), -0.2), 0.2, 5.0),
            0.5,  # non-finite error: halve and retry rather than poisoning dt
        )
        x_new = jnp.where(accept, x5, x32)
        t_new = jnp.where(accept, t + dt, t)
        k1_new = jnp.where(accept, ks[-1], k1)  # FSAL
        return (x_new, t_new, dt * factor, k1_new, n + 1)

    x_final, t_final, _, _, _ = jax.lax.while_loop(cond_fn, body, state)
    # Loud failure: if the step budget ran out (or the model went NaN) before
    # reaching t_end, return NaN instead of a silently half-integrated latent.
    converged = jnp.abs(t_final - t_end) <= 1e-6
    x_final = jnp.where(converged, x_final, jnp.float32(jnp.nan))
    return x_final.astype(x.dtype)


def denoise_sde(
    transport: Transport,
    model_fn: ModelFn,
    key: jax.Array,
    x: jnp.ndarray,
    timesteps: jnp.ndarray,
    model_kwargs: dict[str, Any],
    cond: jnp.ndarray | None = None,
    diffusion_form: str = "SBDM",
    diffusion_norm: float = 1.0,
    last_step: str = "Mean",
    method: str = "Euler",
) -> jnp.ndarray:
    """Euler–Maruyama (or Heun) SDE sampler sharing marginals with the flow ODE.

    Flux-time translation of the reference's sde loop
    (transport/integrators.py:5-76, transport.py:252-359): with flux step
    ds < 0, dx = [v - w(t)*score] ds + sqrt(2 w(t) |ds|) dW.
    Available for parity; the shipped pipeline uses the ODE.
    """
    b = x.shape[0]
    plan = transport.path

    def velocity(x, t):
        t_vec = jnp.full((b,), t, dtype=x.dtype)
        inp = jnp.concatenate([x, cond.astype(x.dtype)], axis=-1) if cond is not None else x
        return model_fn(inp, timesteps=t_vec, **model_kwargs)

    def drift_terms(x, t):
        v = velocity(x, t).astype(jnp.float32)
        t_vec = jnp.full((b,), t, dtype=jnp.float32)
        score = transport.score_from_velocity(v, x.astype(jnp.float32), t_vec)
        w = plan.compute_diffusion(x, 1.0 - t_vec, form=diffusion_form, norm=diffusion_norm)
        return v, score, w

    pairs = jnp.stack([timesteps[:-1], timesteps[1:]], axis=1)
    keys = jax.random.split(key, pairs.shape[0])

    def sde_drift(x32, t):
        v, score, w = drift_terms(x32.astype(x.dtype), t)
        return v - w * score, w

    def diffusion_w(x32, t):
        t_vec = jnp.full((b,), t, dtype=jnp.float32)
        return plan.compute_diffusion(x32, 1.0 - t_vec, form=diffusion_form, norm=diffusion_norm)

    if method == "Euler":
        def step(x, inputs):
            pair, k = inputs
            t_cur, t_next = pair[0], pair[1]
            ds = t_next - t_cur  # negative
            x32 = x.astype(jnp.float32)
            drift, w = sde_drift(x32, t_cur)
            noise = jax.random.normal(k, x.shape, dtype=jnp.float32)
            x32 = x32 + drift * ds + jnp.sqrt(2 * w * jnp.abs(ds)) * noise
            return x32.astype(x.dtype), None
    elif method == "Heun":
        # ref integrators.py:40-55: noise first, then a 2-stage drift average.
        # w0 is model-independent (plan diffusion coefficient) — computing it
        # via sde_drift would burn a whole extra model forward per step.
        def step(x, inputs):
            pair, k = inputs
            t_cur, t_next = pair[0], pair[1]
            ds = t_next - t_cur
            x32 = x.astype(jnp.float32)
            noise = jax.random.normal(k, x.shape, dtype=jnp.float32)
            w0 = diffusion_w(x32, t_cur)
            xhat = x32 + jnp.sqrt(2 * w0 * jnp.abs(ds)) * noise
            k1, _ = sde_drift(xhat, t_cur)
            xp = xhat + ds * k1
            k2, _ = sde_drift(xp, t_next)
            x32 = xhat + 0.5 * ds * (k1 + k2)
            return x32.astype(x.dtype), None
    else:
        raise NotImplementedError(f"SDE method {method!r}")

    if last_step is None:
        # no deterministic tail: the stochastic loop covers the full grid
        x, _ = jax.lax.scan(step, x, (pairs, keys))
        return x

    x, _ = jax.lax.scan(step, x, (pairs[:-1], keys[:-1]))
    # deterministic last step (ref transport.py:276-300): Mean = drift-only
    t_cur, t_next = pairs[-1][0], pairs[-1][1]
    if last_step == "Mean":
        v, score, w = drift_terms(x, t_cur)
        x = (x.astype(jnp.float32) + (v - w * score) * (t_next - t_cur)).astype(x.dtype)
    elif last_step == "Euler":
        v = velocity(x, t_cur).astype(jnp.float32)
        x = (x.astype(jnp.float32) + v * (t_next - t_cur)).astype(x.dtype)
    elif last_step == "Tweedie":
        # ref transport.py:286-291: x/alpha(t) + sigma(t)^2/alpha(t) * score
        # (denoising-posterior mean); alpha/sigma take transport time 1 - t
        v, score, _ = drift_terms(x, t_cur)
        t_tr = jnp.full((b,), 1.0 - t_cur, dtype=jnp.float32)
        alpha = plan.compute_alpha_t(t_tr)[0][0]
        sigma = plan.compute_sigma_t(t_tr)[0][0]
        x = (x.astype(jnp.float32) / alpha + (sigma ** 2) / alpha * score).astype(x.dtype)
    else:
        raise NotImplementedError(f"last_step {last_step!r}")
    return x


def sample_ode_likelihood(
    model_fn: ModelFn,
    key: jax.Array,
    x: jnp.ndarray,
    num_steps: int,
    model_kwargs: dict[str, Any],
    cond: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact-likelihood ODE with a Hutchinson divergence estimator
    (ref transport/transport.py:412-469).

    Integrates data -> noise (flux time 0 -> 1): dx/dt = v(x, t),
    dlogp/dt = -div v, with div estimated by Rademacher probes via jvp
    (the JAX-native replacement for the reference's autograd double-pass).

    Returns (logp (B,), terminal state (B, L, D)).
    """
    b = x.shape[0]

    def velocity(x, t):
        t_vec = jnp.full((b,), t, dtype=x.dtype)
        inp = jnp.concatenate([x, cond.astype(x.dtype)], axis=-1) if cond is not None else x
        return model_fn(inp, timesteps=t_vec, **model_kwargs)

    ts = jnp.linspace(0.0, 1.0, num_steps)
    pairs = jnp.stack([ts[:-1], ts[1:]], axis=1)
    keys = jax.random.split(key, pairs.shape[0])

    def step(carry, inputs):
        x, logp = carry
        pair, k = inputs
        t_cur, t_next = pair[0], pair[1]
        dt = t_next - t_cur
        eps = jax.random.rademacher(k, x.shape, dtype=jnp.float32).astype(x.dtype)
        v, jvp_eps = jax.jvp(lambda y: velocity(y, t_cur), (x,), (eps,))
        div_est = jnp.sum(
            (jvp_eps * eps).astype(jnp.float32), axis=tuple(range(1, x.ndim))
        )
        x = x + dt * v.astype(x.dtype)
        # d log p(x(t))/dt = -div v  =>  log p_data = log p_noise + int div dt
        logp = logp + dt * div_est
        return (x, logp), None

    (x, delta_logp), _ = jax.lax.scan(step, (x, jnp.zeros((b,), jnp.float32)), (pairs, keys))
    n = np.prod(x.shape[1:])
    prior_logp = -0.5 * n * np.log(2 * np.pi) - 0.5 * jnp.sum(
        jnp.square(x.astype(jnp.float32)), axis=tuple(range(1, x.ndim))
    )
    return prior_logp + delta_logp, x


class Sampler:
    """Mirrors the reference Sampler API (transport/transport.py:239-410):
    `sample_ode(...)` returns a closure `sample_fn(x, model_fn, model_kwargs)`.

    The closure builds the (static) timestep grid from x's sequence length,
    so downstream code can keep the reference's call pattern
    (visualcloze.py:121-130, 415)."""

    def __init__(self, transport: Transport):
        self.transport = transport

    def sample_ode(
        self,
        *,
        sampling_method: str = "euler",
        num_steps: int = 50,
        atol: float = 1e-6,
        rtol: float = 1e-3,
        reverse: bool = False,
        do_shift: bool = True,
        time_shifting_factor: float | None = None,
        strength: float | None = None,
    ):
        if reverse:
            raise NotImplementedError("reverse sampling is unused by the pipeline")

        def sample_fn(x, model_fn, model_kwargs):
            kwargs = dict(model_kwargs)
            cond = kwargs.pop("cond", None)
            ts = jnp.asarray(
                ode_timesteps(
                    num_steps,
                    int(x.shape[1]),
                    do_shift=do_shift,
                    strength=strength,
                    time_shifting_factor=time_shifting_factor,
                )
            )
            if sampling_method == "dopri5":
                # adaptive: the shift only rewarps fixed grids; endpoints are
                # preserved, so integrate [ts[0], ts[-1]] directly
                return denoise_ode_adaptive(
                    model_fn, x, float(ts[0]), float(ts[-1]), kwargs,
                    cond=cond, atol=atol, rtol=rtol,
                )
            return denoise_ode(model_fn, x, ts, kwargs, cond=cond, method=sampling_method)

        return sample_fn

    def sample_sde(
        self,
        *,
        sampling_method: str = "Euler",
        diffusion_form: str = "SBDM",
        diffusion_norm: float = 1.0,
        last_step: str = "Mean",
        last_step_size: float = 0.04,
        num_steps: int = 250,
    ):
        del last_step_size

        def sample_fn(x, model_fn, model_kwargs, key):
            kwargs = dict(model_kwargs)
            cond = kwargs.pop("cond", None)
            # score-based diffusion forms diverge at the noise endpoint
            # (ICPlan's d_alpha/alpha ratio is 1/t -> inf at data-time 0 ==
            # flux t=1): clip the start like the reference's check_interval
            # (transport.py:302-330 sample_eps)
            eps = self.transport.sample_eps or (
                1e-3 if diffusion_form != "constant" else 0.0
            )
            ts = jnp.asarray(np.linspace(1.0 - eps, 0.0, num_steps, dtype=np.float32))
            return denoise_sde(
                self.transport, model_fn, key, x, ts, kwargs, cond=cond,
                diffusion_form=diffusion_form, diffusion_norm=diffusion_norm,
                last_step=last_step, method=sampling_method,
            )

        return sample_fn
