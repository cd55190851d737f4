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

# torchvision vgg16 `features` layout — the backbone of lpips.LPIPS(net='vgg')
_VGG16_CFG = (
    64, 64, "M",
    128, 128, "M",
    256, 256, 256, "M",
    512, 512, 512, "M",
    512, 512, 512, "M",
)
# lpips vgg16 taps: relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
LPIPS_VGG16_TAPS = (3, 8, 15, 22, 29)
# lpips.pretrained_networks.ScalingLayer constants: input in [-1,1] is
# normalized as (x - shift) / scale
_LPIPS_SHIFT = (-0.030, -0.088, -0.188)
_LPIPS_SCALE = (0.458, 0.448, 0.450)


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
    """VGG feature taps. Input: (N, H, W, 3), already normalized.

    Conv parameters are named conv_<torchvision index> so a converted torch
    state dict maps 1:1. Layers beyond the deepest tap are never built.
    Despite the name, `cfg` makes this generic over the VGG family — the
    LPIPS path runs it with the vgg16 layout (_VGG16_CFG).
    """

    feature_layers: Tuple[int, ...] = DEFAULT_FEATURE_LAYERS
    dtype: Any = jnp.float32
    cfg: Tuple = _VGG19_CFG

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        taps = set(self.feature_layers)
        max_tap = max(taps)
        feats: List[jnp.ndarray] = []
        i = 0
        for c in self.cfg:
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


def convert_lpips_lin_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """lpips.LPIPS(net='vgg') state dict -> {'lin0'..'lin4': (C,) f32}.

    The lpips package stores its learned per-channel weights as 1x1 convs
    ('lin<k>.model.1.weight', shape (1, C, 1, 1)); only these five tensors
    are learned — the vgg16 backbone comes from torchvision and converts via
    convert_torch_vgg19_state_dict (the key layout is identical).
    """
    lins: Dict[str, Any] = {}
    for k, v in sd.items():
        parts = k.split(".")
        if parts[0].startswith("lin") and parts[-1] == "weight":
            arr = np.asarray(v, np.float32).reshape(-1)
            lins[parts[0]] = arr
    if len(lins) != 5:
        raise ValueError(
            f"expected 5 lin layers (lin0..lin4), found {sorted(lins)} — is "
            "this an lpips.LPIPS(net='vgg') state dict?"
        )
    return lins


def save_lpips_params(
    path: str, backbone: Dict[str, Any], lins: Dict[str, Any]
) -> None:
    flat = {}
    for conv, leaves in backbone.items():
        for leaf, arr in leaves.items():
            flat[f"net/{conv}/{leaf}"] = np.asarray(arr, np.float32)
    for name, arr in lins.items():
        flat[f"lin/{name}"] = np.asarray(arr, np.float32)
    np.savez_compressed(path if path.endswith(".npz") else path + ".npz", **flat)


def load_lpips_params(path: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    backbone: Dict[str, Any] = {}
    lins: Dict[str, Any] = {}
    with np.load(path) as z:
        for k in z.files:
            parts = k.split("/")
            if parts[0] == "net":
                backbone.setdefault(parts[1], {})[parts[2]] = jnp.asarray(z[k])
            elif parts[0] == "lin":
                lins[parts[1]] = jnp.asarray(z[k])
    if not backbone or len(lins) != 5:
        raise ValueError(f"not an LPIPS .npz (net/* + 5 lin/*): {path}")
    return backbone, lins


class LPIPSLoss:
    """Exact lpips.LPIPS(net='vgg') semantics (reference train_vae.py:56-96).

    Forward (lpips/lpips.py): scale input by the ScalingLayer constants, run
    the torchvision vgg16 taps (relu1_2/2_2/3_3/4_3/5_3), unit-normalize
    each feature map along channels (eps 1e-10), square the difference, and
    reduce each layer with its LEARNED per-channel linear weight (a frozen
    1x1 conv) + spatial mean; the five layer scores sum. This replaces the
    documented round-3 delta (plain VGG19 feature-L1 as the lpips stand-in).
    Weights convert offline: scripts/convert_vgg_weights.py --lpips.
    """

    def __init__(self, backbone: Dict[str, Any], lins: Dict[str, Any]):
        self.module = VGG19Features(
            feature_layers=LPIPS_VGG16_TAPS, cfg=_VGG16_CFG
        )
        self.backbone = backbone
        self.lins = [lins[f"lin{i}"] for i in range(5)]

    def _to_lpips_input(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, D, H, W, 1) [-1,1] volumes -> (B*D, H, W, 3) scaled frames."""
        B, D, H, W, C = x.shape
        assert C == 1, "expected grayscale volumes (C=1)"
        x = x.reshape(B * D, H, W, 1).astype(jnp.float32)
        x = jnp.repeat(x, 3, axis=-1)  # grayscale -> RGB, still [-1,1]
        shift = jnp.asarray(_LPIPS_SHIFT, jnp.float32)
        scale = jnp.asarray(_LPIPS_SCALE, jnp.float32)
        return (x - shift) / scale

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        fp = self.module.apply({"params": self.backbone}, self._to_lpips_input(pred))
        ft = jax.lax.stop_gradient(
            self.module.apply({"params": self.backbone}, self._to_lpips_input(target))
        )

        def unit(f):
            n = jnp.sqrt(jnp.sum(f * f, axis=-1, keepdims=True))
            return f / (n + 1e-10)

        total = jnp.float32(0.0)
        for a, b, w in zip(fp, ft, self.lins):
            d = (unit(a.astype(jnp.float32)) - unit(b.astype(jnp.float32))) ** 2
            total = total + jnp.mean(jnp.sum(d * w, axis=-1))
        return total

    def middle_slice_loss(
        self, pred: jnp.ndarray, target: jnp.ndarray
    ) -> jnp.ndarray:
        """The reference's usage: LPIPS on the middle slice only."""
        D = pred.shape[1]
        return self(pred[:, D // 2 : D // 2 + 1], target[:, D // 2 : D // 2 + 1])
