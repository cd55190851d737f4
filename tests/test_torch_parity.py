"""Numeric parity against the ACTUAL reference torch modules.

VERDICT r1 item 2: the converter was only validated on name/shape skeletons
and per-op numerics; these tests import the reference's own modules
(/root/reference/models/vae.py, unet3d.py — loaded by file path, read-only),
run them forward on fixed inputs, convert the live state_dict with
scripts/convert_torch_checkpoint.py, and assert the Flax forward computes
the same function to <=1e-4 in f32.

Attention compat note (documented divergence): the reference's value
einsum ('bhqk,bhvc->bhqc', unet3d.py:185) contracts k and v independently,
so its attention output degenerates to a sum over values — our module
implements the intended SDPA ('bhqk,bhkc->bhqc'). Full-UNet parity is
therefore asserted with attention_levels=[] (exact), and the attention
module is asserted against a corrected torch SDPA using the reference
module's own weights.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REF = "/root/reference/models"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from scripts.convert_torch_checkpoint import (  # noqa: E402
    convert_unet_state_dict,
    convert_vae_state_dict,
)


def _load_ref(name):
    spec = importlib.util.spec_from_file_location(f"ref_{name}", f"{REF}/{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _sd_numpy(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _to_ndhwc(x_torch):
    # torch (B, C, T, H, W) -> NDHWC (B, T, H, W, C)
    return jnp.asarray(np.transpose(x_torch.detach().numpy(), (0, 2, 3, 4, 1)))


def _to_torch_layout(x_jax):
    return np.transpose(np.asarray(x_jax), (0, 4, 1, 2, 3))


@pytest.fixture(scope="module")
def ref_vae_mod():
    return _load_ref("vae")


@pytest.fixture(scope="module")
def ref_unet_mod():
    return _load_ref("unet3d")


class TestVAEParity:
    def test_encode_decode_full_forward(self, ref_vae_mod):
        """Reference SliceInterpolationVAE (vae.py:207-325) vs converted Flax."""
        from video_to_video_diffusion_tpu.models.vae import SliceInterpolationVAE

        torch.manual_seed(0)
        tvae = ref_vae_mod.SliceInterpolationVAE(
            in_channels=1, latent_dim=4, base_channels=8, scaling_factor=0.7
        ).eval()
        x_t = torch.rand(1, 1, 4, 32, 32) * 2 - 1
        with torch.no_grad():
            z_t = tvae.encode(x_t)
            r_t = tvae.decode(z_t)

        jvae = SliceInterpolationVAE(
            in_channels=1, latent_dim=4, base_channels=8, scaling_factor=0.7
        )
        params = convert_vae_state_dict(_sd_numpy(tvae), num_down_stages=2)
        x_j = _to_ndhwc(x_t)
        z_j = jvae.apply({"params": params}, x_j, method=jvae.encode)
        r_j = jvae.apply({"params": params}, z_j, method=jvae.decode)

        dz = np.abs(_to_torch_layout(z_j) - z_t.numpy()).max()
        dr = np.abs(_to_torch_layout(r_j) - r_t.numpy()).max()
        print(f"VAE parity: max|dz|={dz:.3e} max|dr|={dr:.3e}")
        assert dz <= 1e-4, f"encode mismatch {dz}"
        assert dr <= 1e-4, f"decode mismatch {dr}"

    def test_posterior_split(self, ref_vae_mod):
        """encode_with_posterior mu/logvar chunk order (vae.py:262-287)."""
        from video_to_video_diffusion_tpu.models.vae import SliceInterpolationVAE

        torch.manual_seed(1)
        tvae = ref_vae_mod.SliceInterpolationVAE(
            in_channels=1, latent_dim=4, base_channels=8, scaling_factor=1.0
        ).eval()
        x_t = torch.rand(1, 1, 2, 16, 16) * 2 - 1
        with torch.no_grad():
            mu_t, logvar_t = tvae.encode_with_posterior(x_t)

        jvae = SliceInterpolationVAE(in_channels=1, latent_dim=4, base_channels=8)
        params = convert_vae_state_dict(_sd_numpy(tvae), num_down_stages=2)
        mu_j, logvar_j = jvae.apply(
            {"params": params}, _to_ndhwc(x_t), method=jvae.encode_with_posterior
        )
        np.testing.assert_allclose(
            _to_torch_layout(mu_j), mu_t.numpy(), atol=1e-4
        )
        np.testing.assert_allclose(
            _to_torch_layout(logvar_j), logvar_t.numpy(), atol=1e-4
        )


def _corrected_attention_forward(self, x):
    """The reference TemporalAttention.forward with ONLY the value einsum
    fixed ('bhqk,bhvc' -> 'bhqk,bhkc', unet3d.py:185) — everything else
    byte-identical to the upstream forward."""
    import torch.nn.functional as F
    from einops import rearrange

    B, C, T, H, W = x.shape
    residual = x
    x = self.norm(x)
    qkv = self.qkv(x)
    qkv = rearrange(qkv, 'b (three c) t h w -> three b c t h w', three=3)
    q, k, v = qkv[0], qkv[1], qkv[2]
    q = rearrange(q, 'b (head c) t h w -> (b h w) head t c', head=self.num_heads)
    k = rearrange(k, 'b (head c) t h w -> (b h w) head t c', head=self.num_heads)
    v = rearrange(v, 'b (head c) t h w -> (b h w) head t c', head=self.num_heads)
    attn = F.softmax(torch.einsum('bhqc,bhkc->bhqk', q, k) * self.head_dim ** -0.5, dim=-1)
    out = torch.einsum('bhqk,bhkc->bhqc', attn, v)  # the fix
    out = rearrange(out, '(b h w) head t c -> b (head c) t h w',
                    b=B, h=H, w=W, head=self.num_heads)
    return self.proj_out(out) + residual


class TestUNetParity:
    def test_full_forward(self, ref_unet_mod, monkeypatch):
        """Full UNet3D forward parity on the reference's own weights.

        The reference applies `mid_attn` unconditionally (unet3d.py:391),
        so even attention_levels=[] exercises its degenerate value-sum
        attention; exact parity is asserted against the reference with its
        attention forward corrected to the intended SDPA (compat note at
        module top), and the unpatched reference is shown to diverge.
        """
        from video_to_video_diffusion_tpu.models.unet3d import UNet3D

        torch.manual_seed(2)
        tunet = ref_unet_mod.UNet3D(
            latent_dim=4, model_channels=8, num_res_blocks=1,
            attention_levels=[0, 1], channel_mult=(1, 2), num_heads=2,
            time_embed_dim=32,
        ).eval()
        z = torch.randn(1, 4, 4, 8, 8)
        c = torch.randn(1, 4, 4, 8, 8)
        t = torch.tensor([17])
        with torch.no_grad():
            eps_degenerate = tunet(z, t, c)
        monkeypatch.setattr(
            ref_unet_mod.TemporalAttention, "forward", _corrected_attention_forward
        )
        with torch.no_grad():
            eps_t = tunet(z, t, c)

        junet = UNet3D(
            latent_dim=4, model_channels=8, num_res_blocks=1,
            attention_levels=(0, 1), channel_mult=(1, 2), num_heads=2,
            time_embed_dim=32,
        )
        params = convert_unet_state_dict(
            _sd_numpy(tunet), num_res_blocks=1, channel_mult=(1, 2),
            attention_levels=(0, 1),
        )
        eps_j = junet.apply(
            {"params": params}, _to_ndhwc(z), jnp.asarray([17]), _to_ndhwc(c)
        )
        d = np.abs(_to_torch_layout(eps_j) - eps_t.numpy()).max()
        d_deg = np.abs(_to_torch_layout(eps_j) - eps_degenerate.numpy()).max()
        print(f"UNet parity: vs corrected-SDPA reference max|d|={d:.3e}, "
              f"vs unpatched (degenerate attention) {d_deg:.3e}")
        assert d <= 1e-4, f"UNet forward mismatch {d}"
        assert d_deg > 1e-3  # the documented divergence is real

    def test_attention_matches_corrected_sdpa(self, ref_unet_mod):
        """Our TemporalAttention == real SDPA with the reference module's own
        weights; the reference's degenerate einsum differs (compat note)."""
        from video_to_video_diffusion_tpu.models.unet3d import TemporalAttention

        torch.manual_seed(3)
        tattn = ref_unet_mod.TemporalAttention(channels=8, num_heads=2).eval()
        x = torch.randn(1, 8, 4, 4, 4)

        # corrected torch forward: same layers, intended value einsum
        with torch.no_grad():
            h = tattn.norm(x)
            qkv = tattn.qkv(h)
            B, _, T, H, W = qkv.shape
            q, k, v = qkv.chunk(3, dim=1)

            def heads(y):
                return (
                    y.reshape(B, 2, 4, T, H, W)
                    .permute(0, 4, 5, 1, 3, 2)
                    .reshape(B * H * W, 2, T, 4)
                )

            qh, kh, vh = heads(q), heads(k), heads(v)
            attn = torch.softmax(
                torch.einsum("bhqc,bhkc->bhqk", qh, kh) * (4 ** -0.5), dim=-1
            )
            out = torch.einsum("bhqk,bhkc->bhqc", attn, vh)  # intended SDPA
            out = (
                out.reshape(B, H, W, 2, T, 4)
                .permute(0, 3, 5, 4, 1, 2)
                .reshape(B, 8, T, H, W)
            )
            y_correct = tattn.proj_out(out) + x
            y_reference = tattn(x)  # degenerate value-sum path

        from scripts.convert_torch_checkpoint import _put_attention

        tree = {}
        # _put_attention reads "<prefix>.<param>" keys; the bare module's
        # state_dict has no prefix, so add one
        sd = {f"a.{k}": v for k, v in _sd_numpy(tattn).items()}
        _put_attention(tree, "a", "a", sd)
        jattn = TemporalAttention(num_heads=2)
        y_j = jattn.apply({"params": tree["a"]}, _to_ndhwc(x))

        d_correct = np.abs(_to_torch_layout(y_j) - y_correct.numpy()).max()
        d_ref = np.abs(_to_torch_layout(y_j) - y_reference.numpy()).max()
        print(f"attention parity: vs corrected SDPA {d_correct:.3e}, "
              f"vs reference degenerate {d_ref:.3e}")
        assert d_correct <= 1e-4
        # and the reference path genuinely computes something else
        assert d_ref > 1e-3
