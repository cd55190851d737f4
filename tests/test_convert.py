"""Torch-checkpoint converter: converted trees must load into our models.

The torch modules below are *name/shape skeletons* (no forward logic) that
reproduce the reference's state_dict naming contract (models/vae.py,
models/unet3d.py upstream) so the converter can be validated without the
reference repo present.
"""

import sys
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
from convert_torch_checkpoint import (  # noqa: E402
    convert_unet_state_dict,
    convert_vae_state_dict,
)

from video_to_video_diffusion_tpu.models.unet3d import UNet3D
from video_to_video_diffusion_tpu.models.vae import SliceInterpolationVAE


def _conv_block(cin, cout, k=3, s=1, p=1, groups=8):
    m = nn.Module()
    m.conv = nn.Conv3d(cin, cout, k, s, p)
    m.norm = nn.GroupNorm(groups, cout)
    return m


def _down(cin, cout):
    m = nn.Module()
    m.conv = nn.Conv3d(cin, cout, (3, 4, 4), (1, 2, 2), (1, 1, 1))
    m.norm = nn.GroupNorm(8, cout)
    return m


def _up(cin, cout):
    m = nn.Module()
    m.conv = nn.ConvTranspose3d(cin, cout, (3, 4, 4), (1, 2, 2), (1, 1, 1))
    m.norm = nn.GroupNorm(8, cout)
    return m


def _vae_res(c):
    m = nn.Module()
    m.conv1 = _conv_block(c, c)
    m.conv2 = nn.Sequential(nn.Conv3d(c, c, 3, padding=1), nn.GroupNorm(8, c))
    return m


def _vae_skeleton(in_ch=1, latent=4, base=16):
    enc = nn.Module()
    enc.conv_in = _conv_block(in_ch, base)
    enc.down1 = nn.Sequential(_vae_res(base), _vae_res(base), _down(base, base * 2))
    enc.down2 = nn.Sequential(_vae_res(base * 2), _vae_res(base * 2), _down(base * 2, base * 4))
    enc.mid = nn.Sequential(_vae_res(base * 4), _vae_res(base * 4))
    enc.conv_out = nn.Conv3d(base * 4, 8, 3, padding=1)
    enc.quant_conv = nn.Conv3d(8, latent, 1)

    dec = nn.Module()
    dec.post_quant_conv = nn.Conv3d(latent, 8, 1)
    dec.conv_in = _conv_block(8, base * 4)
    dec.mid = nn.Sequential(_vae_res(base * 4), _vae_res(base * 4))
    dec.up2_upsample = _up(base * 4, base * 2)
    dec.up2_res = nn.Sequential(_vae_res(base * 2), _vae_res(base * 2))
    dec.up3_upsample = _up(base * 2, base)
    dec.up3_res = nn.Sequential(_vae_res(base), _vae_res(base))
    dec.conv_out = nn.Conv3d(base, in_ch, 3, padding=1)

    root = nn.Module()
    root.encoder = enc
    root.decoder = dec
    return root


def _tree_shapes(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_tree_shapes(v, p))
        else:
            out[p] = tuple(v.shape)
    return out


def test_vae_conversion_matches_flax_structure():
    skel = _vae_skeleton()
    sd = {k: v.detach().numpy() for k, v in skel.state_dict().items()}
    converted = convert_vae_state_dict(sd, num_down_stages=2)

    vae = SliceInterpolationVAE(in_channels=1, latent_dim=4, base_channels=16)
    target = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 16, 16, 1)))["params"]
    got = _tree_shapes(converted)
    want = _tree_shapes(jax.device_get(target))
    assert got == want, (
        set(want) - set(got),
        set(got) - set(want),
        {k: (got.get(k), want.get(k)) for k in want if got.get(k) != want.get(k)},
    )
    # and the converted tree actually runs through the model
    recon, z = vae.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, converted)},
        jnp.ones((1, 2, 16, 16, 1)),
    )
    assert np.isfinite(np.asarray(recon)).all()


def _unet_res(cin, cout, tdim):
    m = nn.Module()
    m.conv1 = _conv_block(cin, cout, groups=min(8, cout))
    m.time_mlp = nn.Sequential(nn.SiLU(), nn.Linear(tdim, cout))
    m.conv2 = nn.Sequential(nn.Conv3d(cout, cout, 3, padding=1), nn.GroupNorm(min(8, cout), cout))
    if cin != cout:
        m.residual_conv = nn.Conv3d(cin, cout, 1)
    return m


def _attn(c):
    m = nn.Module()
    m.norm = nn.GroupNorm(min(8, c), c)
    m.qkv = nn.Conv3d(c, c * 3, 1)
    m.proj_out = nn.Conv3d(c, c, 1)
    return m


def _unet_skeleton(latent=4, ch=8, nres=1, mult=(1, 2), attn_levels=(1,), tdim=32):
    root = nn.Module()
    te = nn.Module()
    te.time_mlp = nn.Sequential(
        nn.Identity(), nn.Linear(ch, tdim), nn.SiLU(), nn.Linear(tdim, tdim)
    )
    root.time_embed = te
    root.conv_in = nn.Conv3d(latent * 2, ch, 3, padding=1)
    levels = len(mult)
    root.down_blocks = nn.ModuleList()
    root.down_samples = nn.ModuleList()
    c = ch
    for level, m_ in enumerate(mult):
        out_c = ch * m_
        blocks = nn.ModuleList()
        for _ in range(nres):
            layers = nn.ModuleList([_unet_res(c, out_c, tdim)])
            if level in attn_levels:
                layers.append(_attn(out_c))
            blocks.append(layers)
            c = out_c
        root.down_blocks.append(blocks)
        root.down_samples.append(
            nn.Module() if level == levels - 1 else _down_plain(c)
        )
    root.mid_block1 = _unet_res(c, c, tdim)
    root.mid_attn = _attn(c)
    root.mid_block2 = _unet_res(c, c, tdim)
    root.up_blocks = nn.ModuleList()
    root.up_samples = nn.ModuleList()
    for level, m_ in enumerate(reversed(mult)):
        out_c = ch * m_
        mirror = levels - 1 - level
        blocks = nn.ModuleList()
        for i in range(nres + 1):
            cin = c + ch * mult[mirror] if i == 0 else c
            layers = nn.ModuleList([_unet_res(cin, out_c, tdim)])
            if mirror in attn_levels:
                layers.append(_attn(out_c))
            blocks.append(layers)
            c = out_c
        root.up_blocks.append(blocks)
        root.up_samples.append(
            nn.Module() if level == levels - 1 else _up_plain(c)
        )
    root.conv_out = nn.Sequential(
        nn.GroupNorm(min(8, c), c), nn.SiLU(), nn.Conv3d(c, latent, 3, padding=1)
    )
    return root


def _down_plain(c):
    m = nn.Module()
    m.conv = nn.Conv3d(c, c, (3, 4, 4), (1, 2, 2), (1, 1, 1))
    return m


def _up_plain(c):
    m = nn.Module()
    m.conv = nn.ConvTranspose3d(c, c, (3, 4, 4), (1, 2, 2), (1, 1, 1))
    return m


def test_unet_conversion_matches_flax_structure():
    skel = _unet_skeleton()
    sd = {k: v.detach().numpy() for k, v in skel.state_dict().items()}
    converted = convert_unet_state_dict(sd, num_res_blocks=1, channel_mult=(1, 2), attention_levels=(1,))

    unet = UNet3D(latent_dim=4, model_channels=8, num_res_blocks=1,
                  attention_levels=(1,), channel_mult=(1, 2), num_heads=2,
                  time_embed_dim=32)
    z = jnp.zeros((1, 2, 8, 8, 4))
    t = jnp.zeros((1,), jnp.int32)
    target = unet.init(jax.random.PRNGKey(0), z, t, z)["params"]
    got = _tree_shapes(converted)
    want = _tree_shapes(jax.device_get(target))
    assert got == want, (
        sorted(set(want) - set(got))[:5],
        sorted(set(got) - set(want))[:5],
    )
    eps = unet.apply({"params": jax.tree_util.tree_map(jnp.asarray, converted)}, z, t, z)
    assert np.isfinite(np.asarray(eps)).all()


def test_conv_weight_relayout_numerics():
    """Converted conv kernels must compute the same conv (torch vs ours)."""
    import torch.nn.functional as F
    from video_to_video_diffusion_tpu.ops.conv import conv3d

    rng = np.random.default_rng(0)
    w = rng.standard_normal((6, 3, 3, 3, 3), dtype=np.float32)  # torch (O,I,k,k,k)
    x = rng.standard_normal((1, 4, 8, 8, 3), dtype=np.float32)
    ours = conv3d(
        jnp.asarray(x), jnp.asarray(np.transpose(w, (2, 3, 4, 1, 0))), None, 1, 1
    )
    theirs = (
        F.conv3d(torch.from_numpy(x.copy()).permute(0, 4, 1, 2, 3), torch.from_numpy(w.copy()), padding=1)
        .permute(0, 2, 3, 4, 1)
        .numpy()
    )
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-4)
