"""
Losses for VAE training: perceptual (VGG16-features), hinge GAN losses,
VQ regularizer, focal / bce-focal.

Behavioral parity with /root/reference/src/nn/losses/vae.py:22-151. The
perceptual loss reproduces the VGG16-features trunk in JAX; pretrained ImageNet
weights load from ``FMDM_VGG16_WEIGHTS`` (an .npz of torchvision's state_dict)
when available — this zero-egress image has none, so like the reference's
missing-torchvision fallback (vae.py:15-19, 52-54) the loss degrades to 0 and
training proceeds.
"""

from __future__ import annotations

import os
from typing import Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fmdm_tpu.nn.module import Module, Params
from fmdm_tpu.nn.layers import Conv, Sequential
from fmdm_tpu.ops.resample import max_pool_nd, resize_bilinear

# VGG16 "features" layout (conv indices in torchvision naming)
_VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"]


class _MaxPool(Module):
    def __call__(self, params, x, **kwargs):
        return max_pool_nd(x, 2, 2)


class _ReLU(Module):
    def __call__(self, params, x, **kwargs):
        return jax.nn.relu(x)


def _build_vgg16_features() -> Sequential:
    layers = []
    in_ch = 3
    for v in _VGG16_CFG:
        if v == "M":
            layers.append(_MaxPool())
        else:
            layers.append(Conv(2, in_ch, v, kernel_size=3, padding=1))
            layers.append(_ReLU())
            in_ch = v
    return Sequential(layers)


class PerceptualLoss(Module):
    """VGG16-features L1 perceptual loss (vae.py:22-72). Enabled only when
    pretrained weights are available (random VGG features are meaningless)."""

    def __init__(
        self,
        resize: bool = False,
        layers: Tuple[int, ...] = (3, 8, 15, 22),
        layer_weights: Iterable[float] = (1.0, 1.0, 1.0, 1.0),
        weights_path: Optional[str] = None,
    ):
        super().__init__()
        self.resize = resize
        self.layer_indices = set(layers)
        self.layer_weights = list(layer_weights)
        self.max_layer = max(layers) if layers else -1
        path = weights_path or os.environ.get("FMDM_VGG16_WEIGHTS")
        self.enabled = bool(path) and os.path.exists(path or "")
        self._weights_path = path
        if self.enabled:
            self.features = _build_vgg16_features()

    def load_params(self) -> Optional[Params]:
        """Load pretrained VGG16 feature weights from the configured .npz
        (torchvision state_dict keys 'features.N.weight' in OIHW)."""
        if not self.enabled:
            return None
        raw = np.load(self._weights_path)
        params: Params = {}
        for key in raw.files:
            if not key.startswith("features."):
                continue
            _, idx, kind = key.split(".")
            params.setdefault(idx, {})[kind] = jnp.asarray(raw[key])
        return params

    def __call__(self, params: Optional[Params], recon: jax.Array, target: jax.Array, **kwargs) -> jax.Array:
        if not self.enabled or params is None:
            return jnp.zeros((), recon.dtype)
        if recon.shape[1] == 1:
            recon = jnp.tile(recon, (1, 3) + (1,) * (recon.ndim - 2))
            target = jnp.tile(target, (1, 3) + (1,) * (target.ndim - 2))
        if self.resize:
            recon = resize_bilinear(recon, (224, 224))
            target = resize_bilinear(target, (224, 224))
        loss = jnp.zeros((), jnp.float32)
        weight_iter = iter(self.layer_weights)
        r, t = recon, target
        for idx, layer in enumerate(self.features):
            p = params.get(str(idx), {})
            r = layer(p, r)
            t = layer(p, t)
            if idx in self.layer_indices:
                w = next(weight_iter, 1.0)
                loss = loss + w * jnp.mean(jnp.abs(r - t))
            if idx >= self.max_layer:
                break
        return loss


# ---------------------------------------------------------------------------
# GAN / focal losses (pure functions)
# ---------------------------------------------------------------------------

def discriminator_hinge_loss(real_pred: jax.Array, fake_pred: jax.Array) -> jax.Array:
    return jnp.mean(jax.nn.relu(1.0 - real_pred)) + jnp.mean(jax.nn.relu(1.0 + fake_pred))


def generator_hinge_loss(fake_pred: jax.Array) -> jax.Array:
    return -jnp.mean(fake_pred)


def vq_regularizer(latents: jax.Array) -> jax.Array:
    spatial = tuple(range(2, latents.ndim))
    mean = jnp.mean(latents, axis=(0, *spatial), keepdims=True)
    centered = latents - mean
    var = jnp.mean(centered**2)
    mean_penalty = jnp.mean(mean**2)
    return mean_penalty + var


def _bce_with_logits(logits, targets):
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def focal_loss(logits, targets, alpha: float = 0.25, gamma: float = 2.0, reduction: str = "mean"):
    prob = jax.nn.sigmoid(logits)
    ce = _bce_with_logits(logits, targets)
    p_t = prob * targets + (1 - prob) * (1 - targets)
    alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
    loss = alpha_t * (1 - p_t) ** gamma * ce
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def bce_focal_loss(logits, targets, alpha: float = 0.25, gamma: float = 2.0, reduction: str = "mean"):
    bce = _bce_with_logits(logits, targets)
    if reduction == "mean":
        bce = jnp.mean(bce)
    elif reduction == "sum":
        bce = jnp.sum(bce)
    return bce + focal_loss(logits, targets, alpha=alpha, gamma=gamma, reduction=reduction)
