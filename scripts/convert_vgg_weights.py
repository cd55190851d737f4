"""Convert torchvision VGG19 weights to the Flax perceptual-loss format.

The TPU host has no network egress, so pretrained VGG19 weights must be
converted once (anywhere torch runs) and shipped as an .npz:

  # on a machine with torchvision + the downloaded checkpoint:
  python -c "import torch, torchvision; torch.save(
      torchvision.models.vgg19(weights='IMAGENET1K_V1').state_dict(),
      'vgg19.pth')"
  # then (torch CPU is enough; torchvision not required here):
  python scripts/convert_vgg_weights.py --torch-weights vgg19.pth \
      --output vgg19_features.npz

Point `losses.perceptual_weights_path` at the output to enable
`losses.use_perceptual_loss` (models/perceptual.py; reference semantics:
models/losses.py:22-146).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_torch_sd(path):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):  # a whole module was saved
        sd = sd.state_dict()
    return {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--torch-weights", required=True,
                    help=".pth state dict: full vgg19/vgg16 ('features.N.*' "
                         "keys) or its features stack ('N.*' keys)")
    ap.add_argument("--output", default="vgg19_features.npz")
    ap.add_argument("--lpips-weights", default=None,
                    help="lpips.LPIPS(net='vgg') state dict (.pth): emit an "
                         "exact-LPIPS .npz instead — --torch-weights must "
                         "then be the torchvision VGG16 backbone. Get it "
                         "with: torch.save(lpips.LPIPS(net='vgg')"
                         ".state_dict(), 'lpips_vgg.pth')")
    args = ap.parse_args(argv)

    from video_to_video_diffusion_tpu.models.perceptual import (
        convert_lpips_lin_state_dict,
        convert_torch_vgg19_state_dict,
        save_lpips_params,
        save_vgg19_params,
    )

    params = convert_torch_vgg19_state_dict(_load_torch_sd(args.torch_weights))
    n = sum(v["kernel"].size + v["bias"].size for v in params.values())
    if args.lpips_weights:
        lins = convert_lpips_lin_state_dict(_load_torch_sd(args.lpips_weights))
        save_lpips_params(args.output, params, lins)
        print(
            f"wrote {args.output}: vgg16 backbone {len(params)} convs "
            f"({n/1e6:.1f}M params) + 5 learned lin layers"
        )
        return
    save_vgg19_params(args.output, params)
    print(f"wrote {args.output}: {len(params)} convs, {n/1e6:.1f}M params")
    return args.output


if __name__ == "__main__":
    main()
