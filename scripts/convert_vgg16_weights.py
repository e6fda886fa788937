"""
Convert torchvision VGG16 'features' weights to the .npz the PerceptualLoss
expects (fmdm_tpu/nn/losses.py). Run on a machine with torchvision:

    python scripts/convert_vgg16_weights.py vgg16_features.npz
    export FMDM_VGG16_WEIGHTS=/path/to/vgg16_features.npz

Also accepts a local torch state_dict file (e.g. downloaded vgg16 .pth):

    python scripts/convert_vgg16_weights.py out.npz --state-dict vgg16.pth
"""

from __future__ import annotations

import argparse

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("output", help="Output .npz path")
    parser.add_argument("--state-dict", default=None,
                        help="Optional local torch .pth state_dict (otherwise torchvision download)")
    args = parser.parse_args()

    import torch

    if args.state_dict:
        state = torch.load(args.state_dict, map_location="cpu")
        if hasattr(state, "state_dict"):
            state = state.state_dict()
    else:
        from torchvision import models

        vgg = models.vgg16(weights=models.VGG16_Weights.IMAGENET1K_FEATURES)
        state = vgg.state_dict()

    out = {}
    for key, value in state.items():
        if key.startswith("features."):
            out[key] = value.detach().cpu().numpy().astype(np.float32)
    if not out:
        raise SystemExit("No 'features.*' keys found in the state dict.")
    np.savez(args.output, **out)
    print(f"Wrote {len(out)} tensors to {args.output}")


if __name__ == "__main__":
    main()
