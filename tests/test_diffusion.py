"""Diffusion schedule / forward process / loss tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from video_to_video_diffusion_tpu.models.diffusion import (
    diffusion_training_loss,
    make_schedule,
    min_snr_weight,
    posterior_mean_variance,
    predict_z0_from_noise,
    q_sample,
    sample_timesteps,
)


@pytest.fixture(scope="module")
def sched():
    return make_schedule("cosine", 100)


def test_schedule_constants_closed_form(sched):
    betas = np.asarray(sched.betas)
    assert betas.shape == (100,)
    assert (betas >= 0.0001 - 1e-9).all() and (betas <= 0.9999 + 1e-9).all()
    np.testing.assert_allclose(
        np.asarray(sched.alphas_cumprod), np.cumprod(1 - betas), rtol=1e-3, atol=1e-7
    )
    np.testing.assert_allclose(np.asarray(sched.alphas_cumprod_prev)[0], 1.0)
    np.testing.assert_allclose(
        np.asarray(sched.alphas_cumprod_prev)[1:],
        np.asarray(sched.alphas_cumprod)[:-1],
    )
    # posterior variance formula (reference models/diffusion.py:57)
    abar = np.asarray(sched.alphas_cumprod)
    abar_prev = np.asarray(sched.alphas_cumprod_prev)
    np.testing.assert_allclose(
        np.asarray(sched.posterior_variance),
        betas * (1 - abar_prev) / (1 - abar),
        rtol=1e-4,
    )


def test_linear_schedule_endpoints():
    s = make_schedule("linear", 50, 0.0001, 0.02)
    np.testing.assert_allclose(float(s.betas[0]), 0.0001, rtol=1e-5)
    np.testing.assert_allclose(float(s.betas[-1]), 0.02, rtol=1e-5)


def test_unknown_schedule_raises():
    with pytest.raises(ValueError):
        make_schedule("bogus", 10)


def test_q_sample_statistics(sched):
    """z_t should have the closed-form mean/std mixture."""
    key = jax.random.PRNGKey(0)
    z0 = jnp.ones((4, 2, 4, 4, 2))
    t = jnp.full((4,), 50, jnp.int32)
    noise = jax.random.normal(key, z0.shape)
    z_t = q_sample(sched, z0, t, noise)
    c0 = float(sched.sqrt_alphas_cumprod[50])
    c1 = float(sched.sqrt_one_minus_alphas_cumprod[50])
    np.testing.assert_allclose(np.asarray(z_t), c0 * np.ones_like(z_t) + c1 * np.asarray(noise), rtol=1e-5)


def test_q_sample_roundtrip_z0(sched):
    key = jax.random.PRNGKey(1)
    z0 = jax.random.normal(key, (2, 3, 4, 4, 2))
    t = jnp.asarray([10, 70], jnp.int32)
    noise = jax.random.normal(jax.random.PRNGKey(2), z0.shape)
    z_t = q_sample(sched, z0, t, noise)
    z0_rec = predict_z0_from_noise(sched, z_t, t, noise)
    np.testing.assert_allclose(np.asarray(z0_rec), np.asarray(z0), atol=1e-4)


def test_min_snr_weight(sched):
    t = jnp.arange(100, dtype=jnp.int32)
    w = np.asarray(min_snr_weight(sched, t))
    abar = np.asarray(sched.alphas_cumprod)
    snr = abar / (1 - abar + 1e-8)
    expected = np.minimum(snr, 5.0) / (snr + 1e-8)
    np.testing.assert_allclose(w, expected, rtol=1e-5)
    assert (w <= 1.0 + 1e-6).all()


def test_loss_unmasked_matches_manual(sched):
    key = jax.random.PRNGKey(3)
    eps_p = jax.random.normal(key, (3, 2, 4, 4, 2))
    eps_t = jnp.zeros_like(eps_p)
    t = jnp.asarray([5, 50, 95], jnp.int32)
    loss, _ = diffusion_training_loss(sched, eps_p, eps_t, t)
    w = np.asarray(min_snr_weight(sched, t))
    per = np.asarray(eps_p ** 2).reshape(3, -1).mean(axis=1)
    np.testing.assert_allclose(float(loss), float((per * w).mean()), rtol=1e-5)


def test_loss_masked_equal_counts(sched):
    """All-ones mask with equal counts must equal the unmasked... formula."""
    key = jax.random.PRNGKey(4)
    eps_p = jax.random.normal(key, (2, 4, 2, 2, 1))
    eps_t = jnp.zeros_like(eps_p)
    t = jnp.asarray([10, 20], jnp.int32)
    mask = jnp.ones((2, 4, 1, 1, 1))
    loss_m, _ = diffusion_training_loss(sched, eps_p, eps_t, t, mask=mask)
    # reference equal-count path: global masked mean * mean(weight)
    w = np.asarray(min_snr_weight(sched, t))
    manual = np.asarray(eps_p ** 2).mean() * w.mean()
    np.testing.assert_allclose(float(loss_m), manual, rtol=1e-5)


def test_loss_masked_variable_counts(sched):
    """Variable valid counts use per-sample normalization (reference :174-192)."""
    eps_p = jnp.ones((2, 4, 2, 2, 1))
    eps_t = jnp.zeros_like(eps_p)
    t = jnp.asarray([10, 10], jnp.int32)
    mask = jnp.asarray([[1, 1, 1, 1], [1, 1, 0, 0]], jnp.float32)[:, :, None, None, None]
    loss, _ = diffusion_training_loss(sched, eps_p, eps_t, t, mask=mask)
    w = float(min_snr_weight(sched, jnp.asarray([10]))[0])
    # each sample: masked mse mean over its own valid = 1.0 -> *w, batch mean = w
    np.testing.assert_allclose(float(loss), w, rtol=1e-5)


def test_loss_ignores_padding_values(sched):
    """Changing predictions only in masked-out voxels must not change the loss."""
    key = jax.random.PRNGKey(5)
    eps_p = jax.random.normal(key, (2, 4, 2, 2, 1))
    eps_t = jnp.zeros_like(eps_p)
    t = jnp.asarray([30, 60], jnp.int32)
    mask = jnp.asarray([[1, 1, 0, 0], [1, 0, 0, 0]], jnp.float32)[:, :, None, None, None]
    loss1, _ = diffusion_training_loss(sched, eps_p, eps_t, t, mask=mask)
    eps_p2 = eps_p.at[:, 2:].set(99.0)
    loss2, _ = diffusion_training_loss(sched, eps_p2, eps_t, t, mask=mask)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)


def test_posterior_mean_variance_shapes(sched):
    z = jnp.ones((2, 3, 4, 4, 2))
    t = jnp.asarray([1, 50], jnp.int32)
    mean, var, logvar = posterior_mean_variance(sched, z, z, t)
    assert mean.shape == z.shape
    assert var.shape == (2, 1, 1, 1, 1)
    np.testing.assert_allclose(np.asarray(jnp.exp(logvar)), np.asarray(var), rtol=1e-4)


def test_sample_timesteps_range(sched):
    t = sample_timesteps(jax.random.PRNGKey(0), 1000, 100)
    t = np.asarray(t)
    assert t.min() >= 0 and t.max() < 100
    assert t.shape == (1000,)
