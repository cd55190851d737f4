"""v-/x0-prediction parametrizations (TPU-side addition; the reference trains
epsilon-prediction only, models/diffusion.py:135-142). Verifies the closed-form
conversions, the Min-SNR weight re-expression, and end-to-end loss/generate
wiring through the composite model and the staged pipeline."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from video_to_video_diffusion_tpu.config import load_config
from video_to_video_diffusion_tpu.models.diffusion import (
    diffusion_training_loss,
    make_schedule,
    min_snr_weight,
    prediction_target,
    predict_z0_from_pred,
    q_sample,
    to_epsilon,
)
from video_to_video_diffusion_tpu.models.model import VideoToVideoDiffusion


@pytest.fixture(scope="module")
def schedule():
    return make_schedule("cosine", 100)


def _zt_z0_noise(schedule, key=0):
    k0, k1 = jax.random.split(jax.random.PRNGKey(key))
    z0 = jax.random.normal(k0, (4, 3, 8, 8, 2), jnp.float32)
    noise = jax.random.normal(k1, z0.shape, jnp.float32)
    t = jnp.asarray([0, 17, 55, 99], jnp.int32)
    z_t = q_sample(schedule, z0, t, noise)
    return z_t, z0, noise, t


@pytest.mark.parametrize("ptype", ["epsilon", "v", "x0"])
def test_target_converts_back_to_noise_and_z0(schedule, ptype):
    """A perfect prediction in any parametrization implies the exact eps/z0."""
    z_t, z0, noise, t = _zt_z0_noise(schedule)
    target = prediction_target(schedule, ptype, z0, t, noise)
    eps = to_epsilon(schedule, ptype, z_t, t, target)
    # x0 at t=99 on a 100-step cosine schedule divides by sqrt(abar)~tiny;
    # allow the corresponding amplification in tolerance.
    np.testing.assert_allclose(np.asarray(eps), np.asarray(noise), atol=5e-3)
    z0_hat = predict_z0_from_pred(schedule, ptype, z_t, t, target)
    np.testing.assert_allclose(np.asarray(z0_hat), np.asarray(z0), atol=5e-3)


def test_v_target_closed_form(schedule):
    z_t, z0, noise, t = _zt_z0_noise(schedule)
    c0 = schedule.sqrt_alphas_cumprod[t][:, None, None, None, None]
    c1 = schedule.sqrt_one_minus_alphas_cumprod[t][:, None, None, None, None]
    v = prediction_target(schedule, "v", z0, t, noise)
    np.testing.assert_allclose(np.asarray(v), np.asarray(c0 * noise - c1 * z0), atol=1e-6)


def test_min_snr_weights_x0_space_forms(schedule):
    """x0-space weights: eps/x0 -> min(snr, g) (reference / Hang et al.);
    v -> min(snr+1, g), which stays 1 at pure noise instead of vanishing —
    the high-noise steps are where DDIM builds structure from conditioning."""
    t = jnp.arange(0, 100, 7, dtype=jnp.int32)
    abar = schedule.alphas_cumprod[t]
    snr = abar / (1.0 - abar + 1e-8)
    w_eps = min_snr_weight(schedule, t, 5.0, "epsilon")
    w_v = min_snr_weight(schedule, t, 5.0, "v")
    w_x0 = min_snr_weight(schedule, t, 5.0, "x0")
    ref = np.minimum(np.asarray(snr), 5.0)
    np.testing.assert_allclose(np.asarray(w_eps * snr), ref, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(w_x0), ref, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(w_v * (snr + 1.0)), np.minimum(np.asarray(snr) + 1.0, 5.0),
        rtol=1e-4,
    )
    # the property that motivated the v form: full weight at the highest-
    # noise timestep (t=T-1), where the strict-equivalence form ~vanishes
    wT = float(min_snr_weight(schedule, jnp.asarray([99]), 5.0, "v")[0])
    assert wT > 0.9


def test_unknown_prediction_type_raises(schedule):
    z_t, z0, noise, t = _zt_z0_noise(schedule)
    with pytest.raises(ValueError, match="prediction_type"):
        prediction_target(schedule, "velocity", z0, t, noise)
    with pytest.raises(ValueError, match="prediction_type"):
        to_epsilon(schedule, "velocity", z_t, t, noise)
    with pytest.raises(ValueError, match="prediction_type"):
        min_snr_weight(schedule, t, 5.0, "velocity")


def test_perfect_prediction_zero_loss(schedule):
    z_t, z0, noise, t = _zt_z0_noise(schedule)
    for ptype in ("epsilon", "v", "x0"):
        target = prediction_target(schedule, ptype, z0, t, noise)
        loss, _ = diffusion_training_loss(
            schedule, target, target, t, prediction_type=ptype
        )
        assert float(loss) == 0.0


def _model(ptype):
    base = load_config("tiny_test").to_dict()
    base["model"]["prediction_type"] = ptype
    return VideoToVideoDiffusion(base)


@pytest.mark.parametrize("ptype", ["v", "x0"])
def test_model_loss_and_generate(ptype):
    model = _model(ptype)
    params = model.init(jax.random.PRNGKey(0), patch_shape=(4, 32, 32), batch=1)
    k = jax.random.PRNGKey(1)
    v_in = jax.random.uniform(k, (1, 2, 32, 32, 1), jnp.float32, -1, 1)
    v_gt = jax.random.uniform(k, (1, 4, 32, 32, 1), jnp.float32, -1, 1)
    loss, metrics = jax.jit(model.loss_fn)(params, v_in, v_gt, k)
    assert np.isfinite(float(loss))
    out = jax.jit(
        lambda p, v, kk: model.generate(p, v, kk, "ddim", 2, target_depth=4)
    )(params, v_in, k)
    assert out.shape == v_gt.shape
    assert np.isfinite(np.asarray(out)).all()


def test_model_rejects_unknown_prediction_type():
    with pytest.raises(ValueError, match="prediction_type"):
        _model("velocity")


def test_staged_pipeline_respects_prediction_type():
    """The staged sample stage converts the net output per the model's
    parametrization: with identical (random) weights, 'epsilon' and 'v'
    models must produce different samples through staged_generate."""
    from video_to_video_diffusion_tpu.inference.pipeline import staged_generate

    m_eps, m_v = _model("epsilon"), _model("v")
    params = m_eps.init(jax.random.PRNGKey(0), patch_shape=(4, 32, 32), batch=1)
    k = jax.random.PRNGKey(2)
    v_in = jax.random.uniform(k, (1, 2, 32, 32, 1), jnp.float32, -1, 1)
    out_eps = np.asarray(staged_generate(m_eps, params, v_in, k, 2, target_depth=4))
    out_v = np.asarray(staged_generate(m_v, params, v_in, k, 2, target_depth=4))
    assert out_eps.shape == out_v.shape
    assert not np.allclose(out_eps, out_v)


def test_config_parses_prediction_type():
    base = load_config("tiny_test").to_dict()
    base["model"]["prediction_type"] = "v"
    cfg = load_config(base)
    assert cfg.model.prediction_type == "v"
    assert load_config("tiny_test").model.prediction_type == "epsilon"
