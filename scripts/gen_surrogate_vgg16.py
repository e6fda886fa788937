"""
Generate deterministic surrogate VGG16-features weights for the perceptual
loss (fmdm_tpu/nn/losses.py::PerceptualLoss).

Real ImageNet-pretrained VGG16 weights cannot be obtained in this image (no
torchvision, no network egress — see scripts/convert_vgg16_weights.py for the
converter to run where they are available). The surrogate fills two roles the
real weights are not needed for:

1. CI exercise of the complete perceptual path — npz loading, OIHW conv
   cross-load, the 4 tapped feature blocks, L1 aggregation, gradient flow —
   with a non-zero loss value (tests/test_perceptual_loss.py).
2. Numerical validation of the JAX VGG16-features port against torch running
   the SAME weights: port correctness is a property of the architecture
   mapping, not of the weight values, so parity on He-initialized weights
   proves the trunk that real weights would drop into.

He initialization keeps activation magnitudes stable through the ReLU stack,
so tapped features are O(1) and the L1 loss is well-conditioned.

Usage:
    python scripts/gen_surrogate_vgg16.py /path/to/vgg16_surrogate.npz
    export FMDM_VGG16_WEIGHTS=/path/to/vgg16_surrogate.npz
"""

from __future__ import annotations

import sys
from typing import Dict

import numpy as np

# torchvision vgg16.features layer indices of the conv layers, with their
# (out_ch, in_ch) — matches fmdm_tpu.nn.losses._VGG16_CFG expansion.
VGG16_CONV_LAYERS = [
    (0, 64, 3), (2, 64, 64),
    (5, 128, 64), (7, 128, 128),
    (10, 256, 128), (12, 256, 256), (14, 256, 256),
    (17, 512, 256), (19, 512, 512), (21, 512, 512),
    (24, 512, 512), (26, 512, 512), (28, 512, 512),
]


def generate_surrogate_state(seed: int = 0, through_layer: int = 22) -> Dict[str, np.ndarray]:
    """torchvision-keyed state dict ('features.N.weight' OIHW,
    'features.N.bias') with deterministic He-init values."""
    rng = np.random.RandomState(seed)
    state: Dict[str, np.ndarray] = {}
    for idx, out_ch, in_ch in VGG16_CONV_LAYERS:
        if idx > through_layer:
            break
        fan_in = in_ch * 9
        std = np.sqrt(2.0 / fan_in)
        state[f"features.{idx}.weight"] = rng.randn(out_ch, in_ch, 3, 3).astype(np.float32) * std
        state[f"features.{idx}.bias"] = np.zeros((out_ch,), np.float32)
    return state


def main() -> None:
    if len(sys.argv) != 2:
        raise SystemExit(__doc__)
    state = generate_surrogate_state()
    np.savez(sys.argv[1], **state)
    print(f"Wrote {len(state)} surrogate tensors to {sys.argv[1]}")


if __name__ == "__main__":
    main()
