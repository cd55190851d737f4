"""Convert reference PyTorch checkpoints to this framework's param trees.

Maps the reference's state_dict naming (models/vae.py, models/unet3d.py
upstream) onto our Flax param tree and re-lays-out the weights:

  Conv3d          (O, I, kD, kH, kW)  ->  kernel (kD, kH, kW, I, O)
  ConvTranspose3d (I, O, kD, kH, kW)  ->  kernel (kD, kH, kW, I, O)
  Linear          (O, I)              ->  kernel (I, O)
  GroupNorm       weight/bias         ->  scale/bias

Supports the VAE trainer checkpoints (`vae_best.pt`: raw VAE state_dict or
{'model_state_dict': ...}) and full diffusion checkpoints
({'model_state_dict': {'vae.*', 'unet.*', 'diffusion.*'}}); diffusion buffers
are dropped (recomputed from the schedule config).

Usage:
  python scripts/convert_torch_checkpoint.py --torch vae_best.pt \
      --config vae_training --out checkpoints/vae_converted [--kind vae|full]
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Dict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _conv(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 4, 1, 0)))


def _convT(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 4, 0, 1)))


def _dense(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _set(tree: Dict, path: str, value: np.ndarray) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _put_conv_block(out, prefix_t, prefix_j, sd, transposed=False):
    """reference Conv3DBlock / Down / Up: .conv + .norm."""
    k = _convT if transposed else _conv
    _set(out, f"{prefix_j}/conv/kernel", k(sd[f"{prefix_t}.conv.weight"]))
    _set(out, f"{prefix_j}/conv/bias", sd[f"{prefix_t}.conv.bias"])
    _set(out, f"{prefix_j}/norm/scale", sd[f"{prefix_t}.norm.weight"])
    _set(out, f"{prefix_j}/norm/bias", sd[f"{prefix_t}.norm.bias"])


def _put_plain_conv(out, name_t, name_j, sd, transposed=False):
    # ConvTranspose3d weights are (I, O, kD, kH, kW) — the I/O axes are
    # swapped vs Conv3d, so a transposed layer needs _convT even when the
    # channel counts happen to be square and the shapes would silently fit.
    k = _convT if transposed else _conv
    _set(out, f"{name_j}/kernel", k(sd[f"{name_t}.weight"]))
    _set(out, f"{name_j}/bias", sd[f"{name_t}.bias"])


def _put_vae_resblock(out, prefix_t, prefix_j, sd):
    """reference models/vae.py ResBlock3D: conv1 (Conv3DBlock) + conv2
    (Sequential[Conv3d, GroupNorm])."""
    _put_conv_block(out, f"{prefix_t}.conv1", f"{prefix_j}/conv1", sd)
    _put_plain_conv(out, f"{prefix_t}.conv2.0", f"{prefix_j}/conv2", sd)
    _set(out, f"{prefix_j}/norm2/scale", sd[f"{prefix_t}.conv2.1.weight"])
    _set(out, f"{prefix_j}/norm2/bias", sd[f"{prefix_t}.conv2.1.bias"])


def convert_vae_state_dict(sd: Dict[str, np.ndarray], num_down_stages: int = 2) -> Dict:
    """Reference SliceInterpolationVAE state_dict -> our vae param tree."""
    out: Dict = {}
    # ---- encoder (reference vae.py:100-147) ----
    e = "encoder"
    _put_conv_block(out, f"{e}.conv_in", f"{e}/conv_in", sd)
    for i in range(1, num_down_stages + 1):
        _put_vae_resblock(out, f"{e}.down{i}.0", f"{e}/down{i}_res1", sd)
        _put_vae_resblock(out, f"{e}.down{i}.1", f"{e}/down{i}_res2", sd)
        _put_conv_block(out, f"{e}.down{i}.2", f"{e}/down{i}_ds", sd)
    _put_vae_resblock(out, f"{e}.mid.0", f"{e}/mid_res1", sd)
    _put_vae_resblock(out, f"{e}.mid.1", f"{e}/mid_res2", sd)
    _put_plain_conv(out, f"{e}.conv_out", f"{e}/conv_out", sd)
    _put_plain_conv(out, f"{e}.quant_conv", f"{e}/quant_conv", sd)
    # ---- decoder (reference vae.py:150-204) ----
    d = "decoder"
    _put_plain_conv(out, f"{d}.post_quant_conv", f"{d}/post_quant_conv", sd)
    _put_conv_block(out, f"{d}.conv_in", f"{d}/conv_in", sd)
    _put_vae_resblock(out, f"{d}.mid.0", f"{d}/mid_res1", sd)
    _put_vae_resblock(out, f"{d}.mid.1", f"{d}/mid_res2", sd)
    # reference names decoder stages up2, up3 for a 2-stage decoder
    for j in range(1, num_down_stages + 1):
        t = j + 1  # up2, up3, ...
        _put_conv_block(out, f"{d}.up{t}_upsample", f"{d}/up{j}_us", sd, transposed=True)
        _put_vae_resblock(out, f"{d}.up{t}_res.0", f"{d}/up{j}_res1", sd)
        _put_vae_resblock(out, f"{d}.up{t}_res.1", f"{d}/up{j}_res2", sd)
    _put_plain_conv(out, f"{d}.conv_out", f"{d}/conv_out", sd)
    return out


def _put_unet_resblock(out, prefix_t, prefix_j, sd):
    """reference models/unet3d.py ResBlock3D (time-conditioned)."""
    _put_conv_block(out, f"{prefix_t}.conv1", f"{prefix_j}/conv1", sd)
    _set(out, f"{prefix_j}/time_mlp/kernel", _dense(sd[f"{prefix_t}.time_mlp.1.weight"]))
    _set(out, f"{prefix_j}/time_mlp/bias", sd[f"{prefix_t}.time_mlp.1.bias"])
    _put_plain_conv(out, f"{prefix_t}.conv2.0", f"{prefix_j}/conv2", sd)
    _set(out, f"{prefix_j}/norm2/scale", sd[f"{prefix_t}.conv2.1.weight"])
    _set(out, f"{prefix_j}/norm2/bias", sd[f"{prefix_t}.conv2.1.bias"])
    if f"{prefix_t}.residual_conv.weight" in sd:
        _put_plain_conv(out, f"{prefix_t}.residual_conv", f"{prefix_j}/residual_conv", sd)


def _put_attention(out, prefix_t, prefix_j, sd):
    _set(out, f"{prefix_j}/norm/scale", sd[f"{prefix_t}.norm.weight"])
    _set(out, f"{prefix_j}/norm/bias", sd[f"{prefix_t}.norm.bias"])
    _put_plain_conv(out, f"{prefix_t}.qkv", f"{prefix_j}/qkv", sd)
    _put_plain_conv(out, f"{prefix_t}.proj_out", f"{prefix_j}/proj_out", sd)


def convert_unet_state_dict(
    sd: Dict[str, np.ndarray],
    num_res_blocks: int = 2,
    channel_mult=(1, 2, 4, 4),
    attention_levels=(1, 2),
) -> Dict:
    """Reference UNet3D state_dict -> our unet param tree.

    Caveat: the reference's attention weights feed its degenerate value-sum
    attention (unet3d.py:185); loaded into our fixed attention they define a
    *different* function — conversion is for warm-starting, not bit parity.
    """
    out: Dict = {}
    num_levels = len(channel_mult)
    # time embed: Sequential[sinusoidal, Linear, SiLU, Linear]
    _set(out, "time_embed/fc1/kernel", _dense(sd["time_embed.time_mlp.1.weight"]))
    _set(out, "time_embed/fc1/bias", sd["time_embed.time_mlp.1.bias"])
    _set(out, "time_embed/fc2/kernel", _dense(sd["time_embed.time_mlp.3.weight"]))
    _set(out, "time_embed/fc2/bias", sd["time_embed.time_mlp.3.bias"])
    _put_plain_conv(out, "conv_in", "conv_in", sd)

    for level in range(num_levels):
        for i in range(num_res_blocks):
            _put_unet_resblock(out, f"down_blocks.{level}.{i}.0", f"down{level}_res{i}", sd)
            if level in attention_levels:
                _put_attention(out, f"down_blocks.{level}.{i}.1", f"down{level}_attn{i}", sd)
        if level < num_levels - 1:
            _put_plain_conv(out, f"down_samples.{level}.conv", f"down{level}_ds/conv", sd)

    _put_unet_resblock(out, "mid_block1", "mid_res1", sd)
    _put_attention(out, "mid_attn", "mid_attn", sd)
    _put_unet_resblock(out, "mid_block2", "mid_res2", sd)

    for level in range(num_levels):
        mirror = num_levels - 1 - level
        for i in range(num_res_blocks + 1):
            _put_unet_resblock(out, f"up_blocks.{level}.{i}.0", f"up{level}_res{i}", sd)
            if mirror in attention_levels:
                _put_attention(out, f"up_blocks.{level}.{i}.1", f"up{level}_attn{i}", sd)
        if level < num_levels - 1:
            _put_plain_conv(
                out, f"up_samples.{level}.conv", f"up{level}_us/conv", sd,
                transposed=True,
            )

    # conv_out: Sequential[GroupNorm, SiLU, Conv3d]
    _set(out, "out_norm/scale", sd["conv_out.0.weight"])
    _set(out, "out_norm/bias", sd["conv_out.0.bias"])
    _put_plain_conv(out, "conv_out.2", "conv_out", sd)
    return out


def convert_checkpoint(torch_path: str, kind: str = "auto", config=None) -> Dict:
    """Load a torch .pt and return {'vae': ...} / {'vae':..., 'unet':...}."""
    import torch

    raw = torch.load(torch_path, map_location="cpu", weights_only=True)
    sd = raw.get("model_state_dict", raw)
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}

    has_unet = any(k.startswith("unet.") for k in sd)
    has_vae_prefix = any(k.startswith("vae.") for k in sd)
    if kind == "auto":
        kind = "full" if has_unet else "vae"

    from video_to_video_diffusion_tpu.config import load_config

    cfg = load_config(config) if config is not None else load_config({})
    stages = cfg.model.vae_num_down_stages

    if kind == "vae":
        vsd = {k[len("vae."):]: v for k, v in sd.items()} if has_vae_prefix else sd
        return {"vae": convert_vae_state_dict(vsd, stages)}
    vsd = {k[len("vae."):]: v for k, v in sd.items() if k.startswith("vae.")}
    usd = {k[len("unet."):]: v for k, v in sd.items() if k.startswith("unet.")}
    return {
        "vae": convert_vae_state_dict(vsd, stages),
        "unet": convert_unet_state_dict(
            usd,
            cfg.model.unet_num_res_blocks,
            tuple(cfg.model.unet_channel_mult),
            tuple(cfg.model.unet_attention_levels),
        ),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch", required=True, help="torch .pt checkpoint")
    ap.add_argument("--config", default=None)
    ap.add_argument("--kind", default="auto", choices=["auto", "vae", "full"])
    ap.add_argument("--out", required=True, help="output orbax checkpoint dir")
    args = ap.parse_args(argv)

    from video_to_video_diffusion_tpu.utils.checkpoint import save_checkpoint

    params = convert_checkpoint(args.torch, args.kind, args.config)
    save_checkpoint(args.out, {"params": params}, {"converted_from": args.torch})
    n = sum(int(np.prod(v.shape)) for v in _flatten(params))
    print(f"converted {n/1e6:.1f}M params -> {args.out}")


def _flatten(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _flatten(v)
        else:
            yield v


if __name__ == "__main__":
    main()
