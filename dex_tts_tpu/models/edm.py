"""EDM diffusion: loss weighting, preconditioning, and the generalized ODE
sampler compiled as a single lax.scan.

Behavioral equivalent of reference: DEX-TTS/model/edm.py:22-211 (NVIDIA EDM
adapted to mel+prior). Distinctive detail kept: training noise is
*mu-shifted* — n = (randn + mu)·σ (reference: model/edm.py:64) — so the
terminal distribution is centered on the aligned text prior, and sampling
starts from latents = randn/temperature + mu scaled by σ_max.

TPU design: every schedule quantity (σ(t), s(t), derivatives, churn) is a
host-precomputed numpy array of length num_steps; the sampling loop is a
lax.scan whose body is one denoiser evaluation — 50 steps compile into one
XLA program with no host sync.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# preconditioning


def edm_precond_scalings(sigma, sigma_data: float = 0.5):
    """c_skip, c_out, c_in, c_noise for EDM preconditioning.
    reference: DEX-TTS/model/edm.py:88-98."""
    c_skip = sigma_data**2 / (sigma**2 + sigma_data**2)
    c_out = sigma * sigma_data / jnp.sqrt(sigma**2 + sigma_data**2)
    c_in = 1.0 / jnp.sqrt(sigma_data**2 + sigma**2)
    c_noise = jnp.log(sigma) / 4.0
    return c_skip, c_out, c_in, c_noise


def apply_precond(
    denoise_fn, x, sigma, sigma_data: float = 0.5, has_aux: bool = False,
    **kwargs,
):
    """D(x; σ) = c_skip·x + c_out·F(c_in·x; c_noise).

    denoise_fn(x, t, **kwargs) is the raw network; x: (B, n_feats, W);
    sigma: (B,) per-item noise levels. has_aux: denoise_fn returns
    (F_x, aux) and the aux rides along (DiT-cache sampling)."""
    s = sigma.reshape(-1, 1, 1)
    c_skip, c_out, c_in, _ = edm_precond_scalings(s, sigma_data)
    c_noise = jnp.log(sigma) / 4.0
    if has_aux:
        f_x, aux = denoise_fn(c_in * x, c_noise, **kwargs)
        return c_skip * x + c_out * f_x, aux
    f_x = denoise_fn(c_in * x, c_noise, **kwargs)
    return c_skip * x + c_out * f_x


# ---------------------------------------------------------------------------
# training loss


def edm_loss_weight(
    sigma: jnp.ndarray,
    loss_type: str = "base",
    sigma_data: float = 0.5,
) -> jnp.ndarray:
    """Per-σ loss weight; all reference variants.
    reference: DEX-TTS/model/edm.py:37-62."""
    base = (sigma**2 + sigma_data**2) / (sigma * sigma_data) ** 2
    snr = 1.0 / sigma**2
    if loss_type == "base":
        return base
    if loss_type.startswith("base_min_"):
        k = float(loss_type.removeprefix("base_min_"))
        return jnp.minimum(base, k)
    if loss_type.startswith("base_log_"):
        k = float(loss_type.removeprefix("base_log_"))
        return jnp.where(base >= k, jnp.log(base) + (k - np.log(k)), base)
    if loss_type.startswith("min_snr_"):
        k = float(loss_type.removeprefix("min_snr_"))
        return jnp.minimum(snr, k)
    if loss_type.startswith("max_snr_"):
        k = float(loss_type.removeprefix("max_snr_"))
        return jnp.maximum(snr, k)
    if loss_type == "snr":
        return snr
    if loss_type == "inv_snr":
        return 1.0 / snr
    raise ValueError(f"unknown loss_type {loss_type!r}")


def edm_loss(
    key: jax.Array,
    denoise_fn,
    x0: jnp.ndarray,
    mask: jnp.ndarray,
    mu: jnp.ndarray,
    n_feats: int = 80,
    p_mean: float = -1.2,
    p_std: float = 1.2,
    sigma_data: float = 0.5,
    loss_type: str = "base",
    **kwargs,
):
    """EDM training loss with mu-shifted noise.
    reference: DEX-TTS/model/edm.py:22-68."""
    k_sigma, k_noise = jax.random.split(key)
    b = x0.shape[0]
    rnd = jax.random.normal(k_sigma, (b, 1, 1), x0.dtype)
    sigma = jnp.exp(rnd * p_std + p_mean)
    weight = edm_loss_weight(sigma, loss_type, sigma_data)

    noise = (jax.random.normal(k_noise, x0.shape, x0.dtype) + mu) * sigma
    d_x = apply_precond(
        denoise_fn, x0 + noise, sigma[:, 0, 0], sigma_data, **kwargs
    )
    return jnp.sum(weight * (d_x - x0) ** 2) / (jnp.sum(mask) * n_feats)


# ---------------------------------------------------------------------------
# sampler schedules (host-side, static)


@dataclass(frozen=True)
class SamplerConfig:
    """reference: DEX-TTS/model/edm.py:104-109 and call site
    model/diffusion.py:245 (euler / edm discretization / linear schedule /
    no scaling)."""

    num_steps: int = 50
    # euler | heun (reference solvers, DEX-TTS/model/edm.py:104-109) |
    # dpmpp2m (framework addition: DPM-Solver++(2M) — 2nd-order multistep
    # data-prediction solver, Lu et al. 2022, arXiv 2211.01095. One
    # denoiser eval per step like euler but 2nd-order accurate, so ~12-16
    # steps reach the 50-step euler solution of the same ODE; requires
    # scaling="none" (every shipped config) and no churn)
    solver: str = "euler"
    discretization: str = "edm"  # vp | ve | iddpm | edm
    schedule: str = "linear"  # vp | ve | linear
    scaling: str = "none"  # vp | none
    sigma_min: float | None = None
    sigma_max: float | None = None
    rho: float = 7.0
    epsilon_s: float = 1e-3
    c_1: float = 0.001
    c_2: float = 0.008
    m_steps: int = 1000
    alpha: float = 1.0
    s_churn: float = 0.0
    s_min: float = 0.0
    s_max: float = float("inf")
    s_noise: float = 1.0
    # DiT-cache ("turbo") sampling: every k-th step runs the full denoiser
    # and captures the DiT mid-block output; the k-1 steps in between reuse
    # it, recomputing only the cheap conv U-Net path (DeepCache-style,
    # cf. PAPERS.md DiTReducio/Presto — training-free step acceleration).
    # 1 = exact sampling (the default; benchmarks use exact). Requires the
    # euler solver, no churn, and num_steps % interval == 0. Approximate:
    # validate mel-MAE for your model before serving with it.
    dit_cache_interval: int = 1
    # lax.scan unroll factor for the sampling loop (1 = rolled). XLA fuses
    # unrolled bodies better; compile time grows with the factor.
    # 2 measured ~1.2% faster than 1 on v5e at the bench shapes; 5 is flat.
    unroll: int = 2


def _schedule_fns(cfg: SamplerConfig, vp_beta_d: float, vp_beta_min: float):
    if cfg.schedule == "vp":
        sigma = lambda t: np.sqrt(
            np.exp(0.5 * vp_beta_d * t**2 + vp_beta_min * t) - 1
        )
        sigma_deriv = lambda t: 0.5 * (vp_beta_min + vp_beta_d * t) * (
            sigma(t) + 1 / sigma(t)
        )
        sigma_inv = lambda s: (
            np.sqrt(vp_beta_min**2 + 2 * vp_beta_d * np.log(s**2 + 1))
            - vp_beta_min
        ) / vp_beta_d
    elif cfg.schedule == "ve":
        sigma = lambda t: np.sqrt(t)
        sigma_deriv = lambda t: 0.5 / np.sqrt(t)
        sigma_inv = lambda s: s**2
    else:
        sigma = lambda t: t
        sigma_deriv = lambda t: np.ones_like(t)
        sigma_inv = lambda s: s
    if cfg.scaling == "vp":
        s_fn = lambda t: 1 / np.sqrt(1 + sigma(t) ** 2)
        s_deriv = lambda t: -sigma(t) * sigma_deriv(t) * s_fn(t) ** 3
    else:
        s_fn = lambda t: np.ones_like(np.asarray(t, dtype=np.float64))
        s_deriv = lambda t: np.zeros_like(np.asarray(t, dtype=np.float64))
    return sigma, sigma_deriv, sigma_inv, s_fn, s_deriv


_vp_sigma = lambda bd, bm: lambda t: np.sqrt(
    np.exp(0.5 * bd * t**2 + bm * t) - 1
)


def _resolve_sigma_range(cfg: SamplerConfig) -> tuple[float, float]:
    """Per-discretization default σ range. reference: DEX-TTS/model/edm.py:122-135."""
    sigma_min, sigma_max = cfg.sigma_min, cfg.sigma_max
    if sigma_min is None:
        sigma_min = {
            "vp": float(_vp_sigma(19.9, 0.1)(cfg.epsilon_s)),
            "ve": 0.02,
            "iddpm": 0.002,
            "edm": 0.002,
        }[cfg.discretization]
    if sigma_max is None:
        sigma_max = {
            "vp": float(_vp_sigma(19.9, 0.1)(1.0)),
            "ve": 100.0,
            "iddpm": 81.0,
            "edm": 80.0,
        }[cfg.discretization]
    return sigma_min, sigma_max


def _discretize_sigmas(
    cfg: SamplerConfig, sigma_min: float, sigma_max: float,
    vp_beta_d: float, vp_beta_min: float,
) -> np.ndarray:
    """The per-step σ ladder (n,), descending σ_max→σ_min.
    reference: DEX-TTS/model/edm.py:137-152."""
    n = cfg.num_steps
    i = np.arange(n, dtype=np.float64)
    if cfg.discretization == "vp":
        orig_t = 1 + i / (n - 1) * (cfg.epsilon_s - 1)
        return _vp_sigma(vp_beta_d, vp_beta_min)(orig_t)
    if cfg.discretization == "ve":
        orig_t = sigma_max**2 * (sigma_min**2 / sigma_max**2) ** (i / (n - 1))
        return np.sqrt(orig_t)
    if cfg.discretization == "iddpm":
        m = cfg.m_steps
        # NB: computed in float64. The reference builds this table in
        # float32 (edm.py:144-149) where the sqrt((u²+1)/r − 1) recursion is
        # cancellation-limited at small u — its low-σ entries carry ~1e-3
        # relative libm noise. The f64 table is the accurate limit of the
        # same recursion; iddpm σ-steps agree with the reference to ~0.1%
        # at the small-σ end and exactly elsewhere.
        u = np.zeros(m + 1)
        alpha_bar = lambda j: np.sin(0.5 * np.pi * j / m / (cfg.c_2 + 1)) ** 2
        for j in range(m, 0, -1):
            u[j - 1] = np.sqrt(
                (u[j] ** 2 + 1) / max(alpha_bar(j - 1) / alpha_bar(j), cfg.c_1)
                - 1
            )
        u_filtered = u[(u >= sigma_min) & (u <= sigma_max)]
        # torch .round() rounds half to even, as does np.round
        # (reference: edm.py:149)
        idx = np.round((len(u_filtered) - 1) / (n - 1) * i).astype(np.int64)
        return u_filtered[idx]
    return (
        sigma_max ** (1 / cfg.rho)
        + i / (n - 1) * (sigma_min ** (1 / cfg.rho) - sigma_max ** (1 / cfg.rho))
    ) ** cfg.rho


def _vp_betas(cfg: SamplerConfig, sigma_min: float, sigma_max: float):
    vp_beta_d = (
        2
        * (np.log(sigma_min**2 + 1) / cfg.epsilon_s - np.log(sigma_max**2 + 1))
        / (cfg.epsilon_s - 1)
    )
    vp_beta_min = np.log(sigma_max**2 + 1) - 0.5 * vp_beta_d
    return vp_beta_d, vp_beta_min


def build_schedule(cfg: SamplerConfig) -> dict[str, np.ndarray]:
    """Precompute all per-step scalars of the generalized sampler.
    reference: DEX-TTS/model/edm.py:110-180."""
    n = cfg.num_steps
    sigma_min, sigma_max = _resolve_sigma_range(cfg)
    vp_beta_d, vp_beta_min = _vp_betas(cfg, sigma_min, sigma_max)
    sigma_steps = _discretize_sigmas(
        cfg, sigma_min, sigma_max, vp_beta_d, vp_beta_min
    )

    sigma, sigma_deriv, sigma_inv, s_fn, s_deriv = _schedule_fns(
        cfg, vp_beta_d, vp_beta_min
    )

    t_steps = np.concatenate([sigma_inv(sigma_steps), [0.0]])  # (n+1,)
    t_cur = t_steps[:-1]
    t_next = t_steps[1:]

    gamma = np.where(
        (cfg.s_min <= sigma(t_cur)) & (sigma(t_cur) <= cfg.s_max),
        min(cfg.s_churn / n, np.sqrt(2) - 1),
        0.0,
    )
    t_hat = sigma_inv(sigma(t_cur) + gamma * sigma(t_cur))
    churn_std = (
        np.sqrt(np.maximum(sigma(t_hat) ** 2 - sigma(t_cur) ** 2, 0.0))
        * s_fn(t_hat)
        * cfg.s_noise
    )

    h = t_next - t_hat
    t_prime = t_hat + cfg.alpha * h

    def coeffs(t):
        a = sigma_deriv(t) / sigma(t) + s_deriv(t) / s_fn(t)
        b = sigma_deriv(t) * s_fn(t) / sigma(t)
        return a, b

    a_hat, b_hat = coeffs(t_hat)
    a_pr, b_pr = coeffs(np.where(t_prime > 0, t_prime, 1.0))  # guard t=0

    f32 = lambda x: np.asarray(x, np.float32)
    return {
        "x_init_scale": f32(sigma(t_steps[0]) * s_fn(t_steps[0])),
        "ratio_s": f32(s_fn(t_hat) / s_fn(t_cur)),
        "churn_std": f32(churn_std),
        "inv_s_hat": f32(1.0 / s_fn(t_hat)),
        "sigma_hat": f32(sigma(t_hat)),
        "a_hat": f32(a_hat),
        "b_hat": f32(b_hat),
        "h": f32(h),
        "alpha_h": f32(cfg.alpha * h),
        "inv_s_prime": f32(1.0 / s_fn(np.where(t_prime > 0, t_prime, 1.0))),
        "sigma_prime": f32(sigma(np.where(t_prime > 0, t_prime, 1.0))),
        "a_prime": f32(a_pr),
        "b_prime": f32(b_pr),
        "last_step": np.arange(n) == n - 1,
    }


def build_dpmpp2m_schedule(cfg: SamplerConfig) -> dict[str, np.ndarray]:
    """Per-step coefficients for DPM-Solver++(2M) (Lu et al. 2022,
    arXiv 2211.01095), data-prediction multistep form for the VE-style
    process x = x₀ + σ·ε (scaling s(t)=1, the only scaling every shipped
    config uses).

    With λ = −ln σ the probability-flow ODE dx/dt = (σ'/σ)(x − D(x;σ))
    becomes dx/dλ = −x + D, integrated exactly over one step under a
    (linearly extrapolated) D:

        x_{i+1} = (σ_{i+1}/σ_i)·x_i + (1 − σ_{i+1}/σ_i)·D̃_i
        D̃_i = c1_i·D_i + c2_i·D_{i−1},  c1 = 1 + 1/(2r), c2 = −1/(2r),
        r_i = h_{i−1}/h_i,  h_i = λ_{i+1} − λ_i

    First and last steps fall back to first order (no history / σ→0),
    matching the standard multistep implementation. Shares the σ ladder
    with the euler/heun sampler, so any discretization works."""
    n = cfg.num_steps
    sigma_min, sigma_max = _resolve_sigma_range(cfg)
    vp_beta_d, vp_beta_min = _vp_betas(cfg, sigma_min, sigma_max)
    sig = _discretize_sigmas(cfg, sigma_min, sigma_max, vp_beta_d, vp_beta_min)

    ratio = np.concatenate([sig[1:], [0.0]]) / sig  # σ_{i+1}/σ_i; last → 0
    c1 = np.ones(n)
    c2 = np.zeros(n)
    if n > 2:
        lam = -np.log(sig)
        h = lam[1:] - lam[:-1]  # (n-1,) finite: excludes the σ=0 terminal
        r = h[:-1] / h[1:]  # r_i for i = 1..n-2
        c1[1 : n - 1] = 1.0 + 1.0 / (2.0 * r)
        c2[1 : n - 1] = -1.0 / (2.0 * r)

    f32 = lambda x: np.asarray(x, np.float32)
    return {
        "x_init_scale": f32(sig[0]),
        "sigma": f32(sig),
        "ratio": f32(ratio),
        "cd": f32(1.0 - ratio),
        "c1": f32(c1),
        "c2": f32(c2),
    }


def ablation_sampler(
    key: jax.Array,
    denoise_fn,
    latents: jnp.ndarray,
    cfg: SamplerConfig,
    sigma_data: float = 0.5,
    denoise_fn_mid=None,
    denoise_fn_cached=None,
    **cond,
):
    """Generalized ODE sampler as one lax.scan.
    reference: DEX-TTS/model/edm.py:104-211.

    denoise_fn(x, t, **cond) is the raw network (preconditioning applied
    here); latents: (B, n_feats, W) ~ N(mu, 1/temperature²) at the facade.

    DiT-cache sampling (cfg.dit_cache_interval > 1) additionally needs
    denoise_fn_mid(x, t, **cond) -> (out, mid) (full eval, captures the
    DiT mid-block) and denoise_fn_cached(x, t, mid=mid, **cond) (conv path
    only, reuses it); the scan then runs over chunks of k steps with one
    full eval per chunk.
    """
    if cfg.solver not in ("euler", "heun", "dpmpp2m"):
        raise ValueError(f"unknown solver {cfg.solver!r}")
    b = latents.shape[0]
    heun = cfg.solver == "heun"

    def denoised_at(x, sigma_scalar):
        sigma_b = jnp.full((b,), sigma_scalar, latents.dtype)
        return apply_precond(denoise_fn, x, sigma_b, sigma_data, **cond)

    if cfg.solver == "dpmpp2m":
        return _dpmpp2m_sampler(denoised_at, latents, cfg)

    sched = {k: jnp.asarray(v) for k, v in build_schedule(cfg).items()}

    if cfg.dit_cache_interval > 1:
        return _dit_cache_sampler(
            denoise_fn_mid, denoise_fn_cached, latents, cfg, sched,
            sigma_data, **cond,
        )

    churn = cfg.s_churn > 0

    def step(carry, per_step):
        x, key = carry
        if churn:
            key, sub = jax.random.split(key)
            x_hat = per_step["ratio_s"] * x + per_step["churn_std"] * (
                jax.random.normal(sub, x.shape, x.dtype)
            )
        else:
            # s(t_hat)/s(t_cur) == 1 when there is no churn (t_hat == t_cur)
            x_hat = per_step["ratio_s"] * x
        den = denoised_at(x_hat * per_step["inv_s_hat"], per_step["sigma_hat"])
        d_cur = per_step["a_hat"] * x_hat - per_step["b_hat"] * den
        x_euler = x_hat + per_step["h"] * d_cur

        if heun:
            # the reference skips the 2nd-order correction on the final
            # step entirely (edm.py:202) — lax.cond keeps that an actual
            # skip (one denoiser eval saved) rather than a discarded eval
            def _heun_update():
                x_prime = x_hat + per_step["alpha_h"] * d_cur
                den2 = denoised_at(
                    x_prime * per_step["inv_s_prime"], per_step["sigma_prime"]
                )
                d_prime = (
                    per_step["a_prime"] * x_prime - per_step["b_prime"] * den2
                )
                return x_hat + per_step["h"] * (
                    (1 - 1 / (2 * cfg.alpha)) * d_cur
                    + (1 / (2 * cfg.alpha)) * d_prime
                )

            x_new = jax.lax.cond(
                per_step["last_step"], lambda: x_euler, _heun_update
            )
        else:
            x_new = x_euler
        return (x_new, key), None

    x0 = latents * sched["x_init_scale"]
    per_step = {k: v for k, v in sched.items() if k != "x_init_scale"}
    (x, _), _ = jax.lax.scan(
        step, (x0, key), per_step, unroll=max(1, cfg.unroll)
    )
    return x


def _dpmpp2m_sampler(denoised_at, latents: jnp.ndarray, cfg: SamplerConfig):
    """DPM-Solver++(2M) as one lax.scan (see build_dpmpp2m_schedule).
    Deterministic; one denoiser eval per step. The first-order fallback on
    the first/last steps is encoded in the (c1, c2) coefficient arrays, so
    the scan body is branch-free."""
    if cfg.scaling != "none":
        raise ValueError("solver='dpmpp2m' requires scaling='none'")
    if cfg.s_churn > 0:
        raise ValueError("solver='dpmpp2m' is deterministic (no churn)")
    if cfg.dit_cache_interval > 1:
        raise ValueError(
            "solver='dpmpp2m' is incompatible with dit_cache_interval>1"
        )
    sched = {k: jnp.asarray(v) for k, v in build_dpmpp2m_schedule(cfg).items()}

    def step(carry, ps):
        x, old_den = carry
        den = denoised_at(x, ps["sigma"])
        den_d = ps["c1"] * den + ps["c2"] * old_den
        x_new = ps["ratio"] * x + ps["cd"] * den_d
        return (x_new, den), None

    x0 = latents * sched["x_init_scale"]
    per_step = {k: v for k, v in sched.items() if k != "x_init_scale"}
    (x, _), _ = jax.lax.scan(
        step, (x0, jnp.zeros_like(x0)), per_step, unroll=max(1, cfg.unroll)
    )
    return x


def _dit_cache_sampler(
    denoise_fn_mid,
    denoise_fn_cached,
    latents: jnp.ndarray,
    cfg: SamplerConfig,
    sched: dict,
    sigma_data: float,
    **cond,
):
    """Euler sampling in chunks of k = cfg.dit_cache_interval steps: the
    chunk's first step runs the full denoiser and captures the DiT
    mid-block; the k-1 following steps reuse it (fresh conv path, fresh
    x/t). Approximate — the exact path is dit_cache_interval=1."""
    k = cfg.dit_cache_interval
    if cfg.solver != "euler":
        raise ValueError("dit_cache_interval>1 requires the euler solver")
    if cfg.s_churn > 0:
        raise ValueError("dit_cache_interval>1 is incompatible with churn")
    if cfg.num_steps % k:
        raise ValueError(
            f"num_steps {cfg.num_steps} must be a multiple of "
            f"dit_cache_interval {k}"
        )
    if denoise_fn_mid is None or denoise_fn_cached is None:
        raise ValueError(
            "dit_cache_interval>1 needs denoise_fn_mid and denoise_fn_cached"
        )
    b = latents.shape[0]

    def euler(x_hat, den, ps):
        d_cur = ps["a_hat"] * x_hat - ps["b_hat"] * den
        return x_hat + ps["h"] * d_cur

    def chunk(x, per_chunk):
        ps0 = {kk: v[0] for kk, v in per_chunk.items()}
        x_hat = ps0["ratio_s"] * x
        den, mid = apply_precond(
            denoise_fn_mid,
            x_hat * ps0["inv_s_hat"],
            jnp.full((b,), ps0["sigma_hat"], latents.dtype),
            sigma_data,
            has_aux=True,
            **cond,
        )
        x = euler(x_hat, den, ps0)
        for i in range(1, k):
            psi = {kk: v[i] for kk, v in per_chunk.items()}
            x_hat = psi["ratio_s"] * x
            den = apply_precond(
                denoise_fn_cached,
                x_hat * psi["inv_s_hat"],
                jnp.full((b,), psi["sigma_hat"], latents.dtype),
                sigma_data,
                mid=mid,
                **cond,
            )
            x = euler(x_hat, den, psi)
        return x, None

    x0 = latents * sched["x_init_scale"]
    per_step = {
        kk: v.reshape(cfg.num_steps // k, k, *v.shape[1:])
        for kk, v in sched.items()
        if kk != "x_init_scale"
    }
    # cfg.unroll counts denoiser steps; a chunk already contains k of them
    chunk_unroll = max(1, cfg.unroll // k)
    x, _ = jax.lax.scan(
        lambda c, p: chunk(c, p), x0, per_step, unroll=chunk_unroll
    )
    return x
