"""Sampler tests: DDIM timestep subsets, determinism, DDPM, stitching."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from video_to_video_diffusion_tpu.models.diffusion import make_schedule
from video_to_video_diffusion_tpu.inference.sampler import (
    ddim_sample,
    ddim_timesteps,
    ddpm_sample,
    gaussian_weight_3d,
    sample_with_stitching,
    stitch_positions,
)


@pytest.fixture(scope="module")
def sched():
    return make_schedule("cosine", 100)


def zero_eps(z, t):
    return jnp.zeros_like(z)


def test_ddim_timesteps_subset():
    ts = ddim_timesteps(1000, 50)
    assert ts[0] == 999 and ts[-1] == 0
    assert (np.diff(ts) < 0).all()
    # uniform stride incl. T-1 (reference sampler.py:221-239)
    ts2 = ddim_timesteps(100, 10)
    assert ts2[0] == 99
    assert set(np.arange(0, 100, 10)) <= set(ts2.tolist())


def test_ddim_deterministic_at_eta0(sched):
    shape = (1, 2, 4, 4, 2)
    z1 = ddim_sample(zero_eps, sched, jax.random.PRNGKey(0), shape, 5)
    z2 = ddim_sample(zero_eps, sched, jax.random.PRNGKey(0), shape, 5)
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))
    z3 = ddim_sample(zero_eps, sched, jax.random.PRNGKey(1), shape, 5)
    assert not np.allclose(np.asarray(z1), np.asarray(z3))


def test_ddim_zero_eps_converges_to_scaled_noise(sched):
    """With eps_pred = 0, each step maps z -> sqrt(a_prev/a_t) clip(z0); the
    final alpha_prev is 1.0, so z_final = clip(z_T / sqrt(a_T), ±10) chained.
    Just check boundedness (the z0 clamp) and finiteness."""
    shape = (1, 2, 4, 4, 2)
    z = ddim_sample(zero_eps, sched, jax.random.PRNGKey(0), shape, 10)
    arr = np.asarray(z)
    assert np.isfinite(arr).all()
    assert np.abs(arr).max() <= 10.0 + 1e-5


def test_ddim_eta_stochastic(sched):
    shape = (1, 2, 4, 4, 2)
    z1 = ddim_sample(zero_eps, sched, jax.random.PRNGKey(0), shape, 5, eta=1.0)
    z2 = ddim_sample(zero_eps, sched, jax.random.PRNGKey(0), shape, 5, eta=0.0)
    assert not np.allclose(np.asarray(z1), np.asarray(z2))


def test_ddpm_runs_and_clips(sched):
    shape = (1, 2, 4, 4, 1)
    z = ddpm_sample(zero_eps, sched, jax.random.PRNGKey(0), shape)
    arr = np.asarray(z)
    assert np.isfinite(arr).all()
    # last step uses clip_denoised [-1,1] and adds no noise at t=0
    assert np.abs(arr).max() <= 1.0 + 1e-5


def test_gaussian_weight_properties():
    w = np.asarray(gaussian_weight_3d(8, 16, 16))
    assert w.shape == (8, 16, 16)
    assert w.max() <= 1.0 + 1e-6
    center = w[3:5, 7:9, 7:9].max()
    assert center == w.max()
    assert w.min() > 0


def test_stitch_positions():
    # reference sampler.py:388-395 semantics: dedup + edge snap
    assert stitch_positions(8, 8, 4) == [0]
    assert stitch_positions(512, 192, 96) == [0, 96, 192, 288, 320]
    assert stitch_positions(10, 4, 4) == [0, 4, 6]


def test_stitching_constant_conservation():
    """A constant generator must stitch to the same constant everywhere."""
    vol = jnp.zeros((1, 4, 32, 32, 1))

    def const_fn(v, k):
        return jnp.full((v.shape[0], v.shape[1] * 2, v.shape[2], v.shape[3], 1), 0.25)

    out = sample_with_stitching(
        const_fn, vol, jax.random.PRNGKey(0),
        patch_size=(2, 16, 16), target_patch_size=(4, 16, 16),
        stride=(1, 8, 8), patch_batch=4,
    )
    assert out.shape == (1, 8, 32, 32, 1)
    np.testing.assert_allclose(np.asarray(out), 0.25, atol=1e-2)


def test_stitching_passthrough_identity():
    """A depth-repeat generator reconstructs an upsampled volume patchwise."""
    base = jnp.broadcast_to(
        jnp.linspace(-1, 1, 32)[None, None, :, None, None], (1, 4, 32, 32, 1)
    )

    def repeat_fn(v, k):
        return jnp.repeat(v, 2, axis=1)

    out = sample_with_stitching(
        repeat_fn, base, jax.random.PRNGKey(0),
        patch_size=(2, 16, 16), target_patch_size=(4, 16, 16),
        stride=(2, 8, 8), patch_batch=4,
    )
    want = np.repeat(np.asarray(base), 2, axis=1)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-2)


# ----------------------------------------------------------------------- EDM
def test_edm_sigmas_snap_to_vp_table(sched):
    from video_to_video_diffusion_tpu.inference.sampler import edm_sigmas

    sigmas, t_idx = edm_sigmas(sched, 10)
    abar = np.asarray(sched.alphas_cumprod, np.float64)
    table = np.sqrt((1.0 - abar) / abar)
    # descending, snapped exactly onto the trained sigma grid
    assert (np.diff(sigmas) < 0).all()
    np.testing.assert_allclose(sigmas, table[t_idx], rtol=0, atol=0)
    # starts at the nearest grid point to the sigma_max=80 cap (the cosine
    # table's own max is huge and would skew the rho grid into pure noise)
    assert t_idx[0] == np.abs(table - min(80.0, table[-1])).argmin()
    assert t_idx[-1] == 0  # ends at sigma_min


def test_edm_sigmas_cap_preserves_step_budget():
    """On the production 1000-step cosine schedule (table sigma_max ~6e4)
    the 80-cap keeps the snapped grid at the requested resolution instead
    of collapsing half the budget into the top few timesteps."""
    from video_to_video_diffusion_tpu.inference.sampler import edm_sigmas

    sched1000 = make_schedule("cosine", 1000)
    sigmas, t_idx = edm_sigmas(sched1000, 20)
    assert len(t_idx) == 20
    assert sigmas[0] <= 80.0 * 1.05
    uncapped, t_un = edm_sigmas(sched1000, 20, sigma_max=float("inf"))
    assert len(t_un) < 20  # documents the failure mode the cap fixes


def test_edm_oracle_recovers_x0_exactly(sched):
    """With an oracle eps the PF-ODE trajectory is a line in sigma, which
    Heun/Euler follow exactly -> the sampler returns x0 to float precision."""
    from video_to_video_diffusion_tpu.inference.sampler import edm_sample

    shape = (2, 2, 4, 4, 2)
    x0 = jax.random.uniform(jax.random.PRNGKey(7), shape, minval=-0.9, maxval=0.9)
    sa = sched.sqrt_alphas_cumprod
    s1 = sched.sqrt_one_minus_alphas_cumprod

    def oracle(z, t):
        return (z - sa[t[0]] * x0) / s1[t[0]]

    out = edm_sample(oracle, sched, jax.random.PRNGKey(0), shape, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=5e-4)


def test_edm_deterministic_and_bounded(sched):
    from video_to_video_diffusion_tpu.inference.sampler import edm_sample

    shape = (1, 2, 4, 4, 2)
    z1 = edm_sample(zero_eps, sched, jax.random.PRNGKey(0), shape, 6)
    z2 = edm_sample(zero_eps, sched, jax.random.PRNGKey(0), shape, 6)
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))
    z3 = edm_sample(zero_eps, sched, jax.random.PRNGKey(1), shape, 6)
    assert not np.allclose(np.asarray(z1), np.asarray(z3))
    assert np.isfinite(np.asarray(z1)).all()
    # final step returns the clamped denoised prediction
    assert np.abs(np.asarray(z1)).max() <= 10.0 + 1e-5


def test_edm_sampler_class_wrapper(sched):
    from video_to_video_diffusion_tpu.inference.sampler import EDMSampler

    s = EDMSampler(sched, zero_eps)
    out = s.sample((1, 2, 4, 4, 2), num_inference_steps=4,
                   key=jax.random.PRNGKey(0))
    assert out.shape == (1, 2, 4, 4, 2)
    assert np.isfinite(np.asarray(out)).all()
