"""Closed-form checks of the jaxpr FLOP counter (ops/flops.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from video_to_video_diffusion_tpu.ops.conv import conv3d
from video_to_video_diffusion_tpu.ops.flops import count_flops


def test_dot_general_closed_form():
    a = jnp.zeros((4, 5), jnp.float32)
    b = jnp.zeros((5, 6), jnp.float32)
    # 2 * M * N * K
    assert count_flops(jnp.matmul, a, b) == 2 * 4 * 6 * 5


def test_conv3d_closed_form():
    x = jnp.zeros((2, 4, 8, 8, 3), jnp.float32)
    k = jnp.zeros((3, 3, 3, 3, 16), jnp.float32)  # DHWIO
    f = lambda x, k: conv3d(x, k, None, stride=1, padding=1)
    out_elems = 2 * 4 * 8 * 8 * 16  # same-padded output, 16 channels
    assert count_flops(f, x, k) == 2 * out_elems * 3 * 27


def test_scan_multiplies_by_length():
    k = jnp.zeros((3, 3, 3, 4, 4), jnp.float32)
    x = jnp.zeros((1, 4, 4, 4, 4), jnp.float32)

    def body(c, _):
        return conv3d(c, k, None, stride=1, padding=1), None

    def scan5(x):
        out, _ = jax.lax.scan(body, x, None, length=5)
        return out

    one = count_flops(lambda x: conv3d(x, k, None, stride=1, padding=1), x)
    assert count_flops(scan5, x) == 5 * one


def test_jitted_and_abstract_args():
    a = jax.ShapeDtypeStruct((8, 3), jnp.float32)
    b = jax.ShapeDtypeStruct((3, 2), jnp.float32)
    assert count_flops(jax.jit(jnp.matmul), a, b) == 2 * 8 * 2 * 3


def test_unet_flops_scale_with_batch():
    """UNet model FLOPs are nonzero, finite, and linear in batch size."""
    from video_to_video_diffusion_tpu.models.model import VideoToVideoDiffusion

    model = VideoToVideoDiffusion("tiny_test")
    params = model.init(jax.random.PRNGKey(0), patch_shape=(4, 32, 32), batch=1)

    def fwd(b):
        z = jax.ShapeDtypeStruct((b, 4, 8, 8, model.latent_dim), jnp.float32)
        t = jax.ShapeDtypeStruct((b,), jnp.int32)
        return count_flops(
            lambda p, z, t, c: model.apply_unet(p, z, t, c), params, z, t, z
        )

    f1, f2 = fwd(1), fwd(2)
    assert f1 > 0 and np.isfinite(f1)
    np.testing.assert_allclose(f2, 2 * f1, rtol=1e-6)


def test_conv_transpose_counts_real_macs_only():
    """A stride-(1,2,2) transposed conv lowers to an lhs-dilated conv; the
    count must be the real MACs (dense formula / prod(dilation))."""
    from video_to_video_diffusion_tpu.ops.conv import conv3d_transpose

    x = jnp.zeros((1, 4, 8, 8, 6), jnp.float32)
    k = jnp.zeros((3, 4, 4, 6, 12), jnp.float32)
    f = lambda x, k: conv3d_transpose(
        x, k, None, stride=(1, 2, 2), padding=(1, 1, 1)
    )
    out = jax.eval_shape(f, x, k)
    dense = 2 * np.prod(out.shape) * 6 * (3 * 4 * 4)
    assert count_flops(f, x, k) == dense / 4
