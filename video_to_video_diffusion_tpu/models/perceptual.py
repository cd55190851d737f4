"""VGG19 feature-space perceptual loss (TPU/Flax).

Rebuild of the reference `VGGPerceptualLoss` (models/losses.py:22-146): a
VGG19 feature extractor tapped at torchvision feature indices
(2, 7, 12, 21, 30 = the conv1_2/2_2/3_2/4_2/5_2 outputs its block slicing
actually selects), grayscale volumes expanded to ImageNet-normalized RGB
slices, L1 feature distance averaged over tap layers. The reference also
uses `lpips.LPIPS(net='vgg')` on the middle slice during VAE training
(training/train_vae.py:56-96); on the TPU path both knobs route through this
VGG19 feature loss — documented delta: LPIPS's learned per-layer linear
weights are replaced by the plain feature-L1 of the diffusion-side loss.

Pretrained weights cannot be downloaded on an egress-less TPU host, so the
loss takes an explicit parameter tree: convert torchvision's
`vgg19(weights=...).state_dict()` once with scripts/convert_vgg_weights.py
(torch CPU is enough) and point `losses.perceptual_weights_path` at the
resulting .npz.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# torchvision vgg19 `features` layout ('M' = 2x2 max-pool); the integer
# position of each entry (convs count 2 slots: conv + relu) reproduces
# torchvision's sequential indices, which is what the reference's
# feature_layers refer to.
_VGG19_CFG = (
    64, 64, "M",
    128, 128, "M",
    256, 256, 256, 256, "M",
    512, 512, 512, 512, "M",
    512, 512, 512, 512, "M",
)

# reference models/losses.py:39 default taps
DEFAULT_FEATURE_LAYERS = (2, 7, 12, 21, 30)

_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


def vgg19_torchvision_indices() -> List[Tuple[int, str]]:
    """[(torchvision_index, 'conv'|'relu'|'pool')] for the features stack."""
    out = []
    i = 0
    for c in _VGG19_CFG:
        if c == "M":
            out.append((i, "pool"))
            i += 1
        else:
            out.append((i, "conv"))
            out.append((i + 1, "relu"))
            i += 2
    return out


class VGG19Features(nn.Module):
    """VGG19 feature taps. Input: (N, H, W, 3), already ImageNet-normalized.

    Conv parameters are named conv_<torchvision index> so a converted torch
    state dict maps 1:1. Layers beyond the deepest tap are never built.
    """

    feature_layers: Tuple[int, ...] = DEFAULT_FEATURE_LAYERS
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        taps = set(self.feature_layers)
        max_tap = max(taps)
        feats: List[jnp.ndarray] = []
        i = 0
        for c in _VGG19_CFG:
            if i > max_tap:
                break
            if c == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                if i in taps:
                    feats.append(x)
                i += 1
            else:
                x = nn.Conv(
                    c, (3, 3), padding=1, dtype=self.dtype, name=f"conv_{i}"
                )(x)
                if i in taps:
                    feats.append(x)  # pre-relu, like vgg[prev:idx+1] slicing
                i += 1
                x = nn.relu(x)
                if i in taps:
                    feats.append(x)
                i += 1
        return feats


def convert_torch_vgg19_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """torch vgg19 state dict -> VGG19Features flax params.

    Accepts full-model keys ('features.0.weight') or features-only keys
    ('0.weight'). Kernels transpose OIHW -> HWIO.
    """
    params: Dict[str, Any] = {}
    for k, v in sd.items():
        name = k[len("features."):] if k.startswith("features.") else k
        parts = name.split(".")
        if len(parts) != 2 or not parts[0].isdigit():
            continue  # classifier weights etc.
        idx, kind = int(parts[0]), parts[1]
        arr = np.asarray(v, dtype=np.float32)
        entry = params.setdefault(f"conv_{idx}", {})
        if kind == "weight":
            entry["kernel"] = arr.transpose(2, 3, 1, 0)
        elif kind == "bias":
            entry["bias"] = arr
    if not params:
        raise ValueError(
            "no conv weights found: expected torchvision-style keys like "
            "'features.0.weight' or '0.weight'"
        )
    return params


def save_vgg19_params(path: str, params: Dict[str, Any]) -> None:
    flat = {}
    for conv, leaves in params.items():
        for leaf, arr in leaves.items():
            flat[f"{conv}/{leaf}"] = np.asarray(arr, np.float32)
    np.savez_compressed(path if path.endswith(".npz") else path + ".npz", **flat)


def load_vgg19_params(path: str) -> Dict[str, Any]:
    """Load a converted VGG19 .npz into a VGG19Features params tree."""
    params: Dict[str, Any] = {}
    with np.load(path) as z:
        for k in z.files:
            conv, leaf = k.split("/")
            params.setdefault(conv, {})[leaf] = jnp.asarray(z[k])
    return params


def _sample_slice_indices(depth: int, rate: float) -> np.ndarray:
    """Evenly-spaced slice subset (reference models/losses.py:84-89:
    torch.linspace(0, D-1, n).long() — float linspace truncated toward 0)."""
    n = max(1, int(depth * rate))
    if n >= depth:
        return np.arange(depth)
    return np.linspace(0, depth - 1, n).astype(np.int64)


class VGGPerceptualLoss:
    """Feature-L1 perceptual loss on sampled 2D slices of NDHWC volumes.

    Semantics parity with the reference module (models/losses.py:22-146):
    even slice subsampling, [-1,1] -> [0,1] -> ImageNet normalization,
    grayscale repeated to RGB, per-layer L1 means averaged over layers,
    target features under stop_gradient. Pure and jittable for static input
    shapes.
    """

    def __init__(
        self,
        params: Dict[str, Any],
        feature_layers: Sequence[int] = DEFAULT_FEATURE_LAYERS,
        use_l1: bool = True,
        slice_sample_rate: float = 0.2,
    ):
        self.module = VGG19Features(feature_layers=tuple(feature_layers))
        self.params = params
        self.use_l1 = use_l1
        self.slice_sample_rate = float(slice_sample_rate)
        self.num_layers = len(feature_layers)

    def _to_vgg_input(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, D, H, W, 1) [-1,1] -> (B*Ds, H, W, 3) ImageNet-normalized."""
        B, D, H, W, C = x.shape
        assert C == 1, "expected grayscale volumes (C=1)"
        idx = _sample_slice_indices(D, self.slice_sample_rate)
        x = x[:, idx].reshape(B * len(idx), H, W, 1).astype(jnp.float32)
        x = (x + 1.0) / 2.0
        x = jnp.repeat(x, 3, axis=-1)
        mean = jnp.asarray(_IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(_IMAGENET_STD, jnp.float32)
        return (x - mean) / std

    def features(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        """Tap features for already-normalized (N, H, W, 3) input."""
        return self.module.apply({"params": self.params}, x)

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        fp = self.features(self._to_vgg_input(pred))
        ft = jax.lax.stop_gradient(self.features(self._to_vgg_input(target)))
        dist = (
            (lambda a, b: jnp.abs(a - b)) if self.use_l1
            else (lambda a, b: (a - b) ** 2)
        )
        loss = sum(dist(a.astype(jnp.float32), b.astype(jnp.float32)).mean()
                   for a, b in zip(fp, ft))
        return loss / self.num_layers

    def middle_slice_loss(
        self, pred: jnp.ndarray, target: jnp.ndarray
    ) -> jnp.ndarray:
        """Middle-slice variant for VAE training (reference
        train_vae.py:76-96 computes LPIPS on D//2 only)."""
        D = pred.shape[1]
        return self(pred[:, D // 2 : D // 2 + 1], target[:, D // 2 : D // 2 + 1])
