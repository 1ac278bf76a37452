"""Numerical parity of the EDM stack against the actual reference
implementation (importable: it depends only on torch+numpy)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dex_tts_tpu.models.edm import (
    SamplerConfig,
    ablation_sampler,
    apply_precond,
    build_schedule,
    edm_loss_weight,
    edm_precond_scalings,
)

torch = pytest.importorskip("torch")

REF = "/root/reference/DEX-TTS"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted"
)
if os.path.isdir(REF):
    # import the reference edm module directly by path — importing the
    # `model` package would pull in monotonic_align's (py38) extension
    import importlib.util

    _spec = importlib.util.spec_from_file_location(
        "ref_edm", os.path.join(REF, "model", "edm.py")
    )
    _ref_edm = importlib.util.module_from_spec(_spec)
    _spec.loader.exec_module(_ref_edm)
    EDMLoss = _ref_edm.EDMLoss
    EDMPrecond = _ref_edm.EDMPrecond
    ref_sampler = _ref_edm.ablation_sampler


def test_loss_weights_match_reference():
    sigmas = np.asarray([0.01, 0.1, 0.5, 1.0, 5.0, 40.0], np.float32)
    t = torch.from_numpy(sigmas).reshape(-1, 1, 1)
    for loss_type in ["base", "base_min_5", "min_snr_5", "max_snr_5", "snr", "inv_snr"]:
        loss_mod = EDMLoss(loss_type=loss_type)
        snr = 1 / t**2
        if loss_type == "base":
            want = ((t**2 + 0.25) / (t * 0.5) ** 2).numpy()
        elif loss_type == "base_min_5":
            base = (t**2 + 0.25) / (t * 0.5) ** 2
            want = torch.minimum(base, torch.full_like(base, 5.0)).numpy()
        elif loss_type == "min_snr_5":
            want = torch.minimum(snr, torch.full_like(snr, 5.0)).numpy()
        elif loss_type == "max_snr_5":
            want = torch.maximum(snr, torch.full_like(snr, 5.0)).numpy()
        elif loss_type == "snr":
            want = snr.numpy()
        else:
            want = (1 / snr).numpy()
        got = np.asarray(edm_loss_weight(jnp.asarray(sigmas)[:, None, None], loss_type))
        np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-5)
        del loss_mod


def test_precond_scalings_match_reference():
    class Probe(torch.nn.Module):
        """Captures the preconditioner's input scaling and noise label."""

        def __init__(self):
            super().__init__()
            self.seen = {}

        def forward(self, x, mask, mu, c_noise, *a, **k):
            self.seen["x"] = x.detach().numpy()
            self.seen["c_noise"] = c_noise.detach().numpy()
            return torch.ones_like(x)

    probe = Probe()
    precond = EDMPrecond(probe)
    x = torch.randn(2, 4, 6)
    sigma = torch.tensor([0.3, 2.0])
    out = precond(
        x, sigma, None, None, None, None, None, None
    ).detach().numpy()

    c_skip, c_out, c_in, c_noise = edm_precond_scalings(
        jnp.asarray(sigma.numpy())[:, None, None]
    )
    want_in = np.asarray(c_in) * x.numpy()
    np.testing.assert_allclose(probe.seen["x"], want_in, rtol=1e-5)
    np.testing.assert_allclose(
        probe.seen["c_noise"], np.asarray(c_noise)[:, 0, 0], rtol=1e-5
    )
    want_out = np.asarray(c_skip) * x.numpy() + np.asarray(c_out) * 1.0
    np.testing.assert_allclose(out, want_out, rtol=1e-5, atol=1e-6)


class _TorchLinearNet(torch.nn.Module):
    """Deterministic toy denoiser D(x, σ) shared by both samplers."""

    sigma_min = 0.0
    sigma_max = float("inf")

    def __init__(self, alpha=0.9):
        super().__init__()
        self.alpha = alpha

    def round_sigma(self, sigma):
        return torch.as_tensor(sigma)

    def forward(self, x, sigma, *args, **kwargs):
        s = torch.as_tensor(sigma, dtype=torch.float64)
        while s.dim() < x.dim():
            s = s.reshape(*s.shape, 1)
        return self.alpha * x / (1.0 + s)


def _jax_linear_denoised(x, sigma, alpha=0.9):
    return alpha * x / (1.0 + sigma.reshape(-1, 1, 1))


@pytest.mark.parametrize(
    "solver,disc,schedule,scaling",
    [
        ("euler", "edm", "linear", "none"),  # the shipped configuration
        ("heun", "edm", "linear", "none"),
        ("euler", "ve", "ve", "none"),
        ("euler", "vp", "vp", "vp"),
        ("heun", "iddpm", "linear", "none"),
    ],
)
def test_sampler_matches_reference(solver, disc, schedule, scaling):
    latents = np.random.default_rng(0).standard_normal((2, 3, 5)).astype(np.float32)
    num_steps = 12
    net = _TorchLinearNet()
    with torch.no_grad():
        want = ref_sampler(
            net,
            torch.from_numpy(latents).double(),
            num_steps=num_steps,
            solver=solver,
            discretization=disc,
            schedule=schedule,
            scaling=scaling,
        ).numpy()

    cfg = SamplerConfig(
        num_steps=num_steps,
        solver=solver,
        discretization=disc,
        schedule=schedule,
        scaling=scaling,
    )

    # bypass the EDM preconditioner: drive the scan arithmetic in numpy
    # float64 (jax x64 is disabled globally; the reference ran in f64)
    sched = {k: np.asarray(v, np.float64) for k, v in build_schedule(cfg).items()}
    x = latents.astype(np.float64) * sched["x_init_scale"]
    for i in range(num_steps):
        x_hat = sched["ratio_s"][i] * x  # no churn
        den = _jax_linear_denoised(
            x_hat * sched["inv_s_hat"][i],
            np.full((2,), sched["sigma_hat"][i]),
        )
        d_cur = sched["a_hat"][i] * x_hat - sched["b_hat"][i] * den
        x_euler = x_hat + sched["h"][i] * d_cur
        if solver == "heun" and i != num_steps - 1:
            x_prime = x_hat + sched["alpha_h"][i] * d_cur
            den2 = _jax_linear_denoised(
                x_prime * sched["inv_s_prime"][i],
                np.full((2,), sched["sigma_prime"][i]),
            )
            d_prime = sched["a_prime"][i] * x_prime - sched["b_prime"][i] * den2
            x = x_hat + sched["h"][i] * (0.5 * d_cur + 0.5 * d_prime)
        else:
            x = x_euler
    got = np.asarray(x)
    # iddpm: the reference's u-table recursion is float32 and cancellation-
    # limited at small σ (ours is the accurate f64 limit) — agreement there
    # is ~1e-2; all other discretizations match tightly.
    rtol = 2e-2 if disc == "iddpm" else 2e-4
    np.testing.assert_allclose(got, want, rtol=rtol, atol=2e-5)


def test_full_sampler_with_precond_runs():
    """ablation_sampler + apply_precond end-to-end on a toy net."""
    def denoise_fn(x, c_noise):
        return 0.5 * x

    latents = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 3, 8)), jnp.float32
    )
    out = ablation_sampler(
        jax.random.PRNGKey(0), denoise_fn, latents, SamplerConfig(num_steps=6)
    )
    assert np.isfinite(np.asarray(out)).all()
    d = apply_precond(denoise_fn, latents, jnp.asarray([1.0, 2.0]))
    assert d.shape == latents.shape


# ---------------------------------------------------------------------------
# DPM-Solver++(2M) — framework-added solver (no reference counterpart)


def _toy_denoise_fn(x, c_noise, **kw):
    """Smooth nonlinear raw network so the probability-flow ODE has real
    curvature (a linear D makes every solver exact)."""
    return jnp.tanh(x) * (1.0 + 0.1 * jnp.reshape(c_noise, (-1, 1, 1)))


def _run_solver(solver: str, steps: int) -> np.ndarray:
    latents = jnp.asarray(
        np.random.default_rng(7).standard_normal((2, 4, 12)), jnp.float32
    )
    cfg = SamplerConfig(num_steps=steps, solver=solver)
    return np.asarray(
        ablation_sampler(jax.random.PRNGKey(0), _toy_denoise_fn, latents, cfg)
    )


def test_dpmpp2m_second_order_convergence():
    """DPM++(2M) reaches the fine-grained ODE solution with far fewer
    denoiser evals than euler — the point of the solver: ~16-25 steps
    instead of 50 in serving. Measured on this toy ODE (1 NFE per step for
    euler/dpmpp2m, 2 for heun):

        steps   euler    heun     dpmpp2m
          16    0.279    0.116    0.123
          25    0.180    0.044    0.047
          50    0.091    0.011    0.011

    i.e. dpmpp2m matches heun's 2nd-order accuracy at HALF heun's NFE and
    beats 50-step euler with 25 evals."""
    ref = _run_solver("euler", 3200)  # fine-grained ground truth
    err_euler25 = np.abs(_run_solver("euler", 25) - ref).max()
    err_euler50 = np.abs(_run_solver("euler", 50) - ref).max()
    err_dpmpp25 = np.abs(_run_solver("dpmpp2m", 25) - ref).max()
    assert np.isfinite(err_dpmpp25)
    # half the NFE of euler@50, better accuracy
    assert err_dpmpp25 < err_euler50, (err_dpmpp25, err_euler50)
    # at equal NFE, at least 2x closer
    assert err_dpmpp25 < 0.5 * err_euler25, (err_dpmpp25, err_euler25)
    # and it converges to the SAME solution, not a different fixed point
    assert np.abs(_run_solver("dpmpp2m", 400) - ref).max() < 5e-3


def test_dpmpp2m_validation():
    latents = jnp.zeros((1, 2, 4), jnp.float32)
    for bad in (
        SamplerConfig(solver="dpmpp2m", scaling="vp", schedule="vp",
                      discretization="vp"),
        SamplerConfig(solver="dpmpp2m", s_churn=1.0),
        SamplerConfig(solver="dpmpp2m", dit_cache_interval=2),
        SamplerConfig(solver="nope"),
    ):
        with pytest.raises(ValueError):
            ablation_sampler(
                jax.random.PRNGKey(0), _toy_denoise_fn, latents, bad
            )
    # 2 steps hits the pure first-order path (no 2M history) and stays
    # finite; num_steps=1 is unsupported by every discretization (the
    # ladder interpolates over n-1 intervals), matching euler/heun
    out = _run_solver("dpmpp2m", 2)
    assert np.isfinite(out).all()
    # for the linear schedule (σ=t) euler's step algebra coincides with
    # the first-order exponential-integrator update, so 2-step results match
    np.testing.assert_allclose(out, _run_solver("euler", 2), rtol=1e-4,
                               atol=1e-4)
