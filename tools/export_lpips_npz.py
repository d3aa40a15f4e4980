"""Export LPIPS backbone + linear weights to the npz eval/lpips.py loads.

The reference ships LPIPS v0.1 via torchvision-pretrained backbones plus
learned per-layer linear weights (/root/reference/lpipsPyTorch/modules/
lpips.py:8, networks.py). This environment has no torchvision and no
network egress, so the converter accepts any of:

  1. torchvision (when importable): --from-torchvision downloads/uses the
     cached VGG16/AlexNet IMAGENET1K_V1 weights;
  2. raw state-dict .pth files: --vgg-pth / --alex-pth (torchvision
     `vgg16().features` / `alexnet().features` layout, full-model state
     dicts accepted — keys are matched by conv order);
  3. official LPIPS v0.1 linear checkpoints: --vgg-lin-pth / --alex-lin-pth
     (keys `lin{k}.model.1.weight`, shape [1, C, 1, 1]). When absent, lin
     weights default to 1/C (documented fallback: unscaled feature
     distance), so the metric still runs.

Usage:
  python tools/export_lpips_npz.py --out lpips_weights.npz \
      [--from-torchvision] [--vgg-pth vgg16.pth] [--alex-pth alexnet.pth] \
      [--vgg-lin-pth lpips_v0.1_vgg.pth] [--alex-lin-pth lpips_v0.1_alex.pth]
  GPT_LPIPS_WEIGHTS=lpips_weights.npz python eval.py ...

Conventions: conv kernels are transposed OIHW -> HWIO; lin weights are
flattened to [C]; all float32. Layer taps must match eval/lpips.py's
VGG_CFG/ALEX_CFG.
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

VGG_CHANNELS = (64, 128, 256, 512, 512)      # tap channels (relu1_2..5_3)
ALEX_CHANNELS = (64, 192, 384, 256, 256)


def _convs_from_state_dict(sd, prefix_out: str, expect: int):
    """Collect conv (weight, bias) pairs in order of their numeric index
    within a torchvision `features` module (keys like `features.0.weight`
    or `0.weight`)."""
    convs = {}
    for k, v in sd.items():
        parts = k.split(".")
        # accept "features.<i>.weight", "<i>.weight", "model.<i>.weight"
        idx = None
        for j, p in enumerate(parts):
            if p.isdigit() and j + 1 < len(parts) and parts[j + 1] in (
                "weight", "bias"
            ):
                idx = int(p)
                kind = parts[j + 1]
                break
        if idx is None:
            continue
        arr = np.asarray(v, np.float32)
        if kind == "weight" and arr.ndim != 4:
            continue  # linear/classifier layers
        convs.setdefault(idx, {})[kind] = arr
    order = sorted(i for i, d in convs.items() if "weight" in d)
    out = {}
    for ci, i in enumerate(order[:expect]):
        w = convs[i]["weight"]                      # OIHW
        out[f"{prefix_out}/conv{ci}/w"] = np.transpose(w, (2, 3, 1, 0))
        out[f"{prefix_out}/conv{ci}/b"] = convs[i].get(
            "bias", np.zeros((w.shape[0],), np.float32)
        )
    if len(order) < expect:
        raise ValueError(
            f"{prefix_out}: found {len(order)} convs, expected {expect}"
        )
    return out


def _lins_from_state_dict(sd, prefix_out: str, channels):
    out = {}
    for k in range(len(channels)):
        key = None
        for cand in (f"lin{k}.model.1.weight", f"lins.{k}.model.1.weight",
                     f"lin{k}.weight"):
            if cand in sd:
                key = cand
                break
        if key is None:
            raise ValueError(f"{prefix_out}: lin{k} not found in checkpoint")
        w = np.asarray(sd[key], np.float32).reshape(-1)
        if w.shape[0] != channels[k]:
            raise ValueError(
                f"{prefix_out}/lin{k}: {w.shape[0]} != {channels[k]}"
            )
        out[f"{prefix_out}/lin{k}"] = np.maximum(w, 0.0)  # LPIPS clamps >= 0
    return out


def _default_lins(prefix_out: str, channels):
    print(f"NOTE: no {prefix_out} lin checkpoint given — writing uniform "
          f"1/C weights (unscaled feature distance).", file=sys.stderr)
    return {
        f"{prefix_out}/lin{k}": np.full((c,), 1.0 / c, np.float32)
        for k, c in enumerate(channels)
    }


def _load_pth(path):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else v
            for k, v in sd.items()}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--from-torchvision", action="store_true")
    ap.add_argument("--vgg-pth")
    ap.add_argument("--alex-pth")
    ap.add_argument("--vgg-lin-pth")
    ap.add_argument("--alex-lin-pth")
    args = ap.parse_args(argv)

    out = {}
    vgg_sd = alex_sd = None
    if args.from_torchvision:
        from torchvision import models

        vgg_sd = {k: v.numpy() for k, v in models.vgg16(
            weights=models.VGG16_Weights.IMAGENET1K_V1
        ).features.state_dict().items()}
        alex_sd = {k: v.numpy() for k, v in models.alexnet(
            weights=models.AlexNet_Weights.IMAGENET1K_V1
        ).features.state_dict().items()}
    if args.vgg_pth:
        vgg_sd = _load_pth(args.vgg_pth)
    if args.alex_pth:
        alex_sd = _load_pth(args.alex_pth)

    if vgg_sd is not None:
        out.update(_convs_from_state_dict(vgg_sd, "vgg", 13))
        if args.vgg_lin_pth:
            out.update(_lins_from_state_dict(
                _load_pth(args.vgg_lin_pth), "vgg", VGG_CHANNELS))
        else:
            out.update(_default_lins("vgg", VGG_CHANNELS))
    if alex_sd is not None:
        out.update(_convs_from_state_dict(alex_sd, "alex", 5))
        if args.alex_lin_pth:
            out.update(_lins_from_state_dict(
                _load_pth(args.alex_lin_pth), "alex", ALEX_CHANNELS))
        else:
            out.update(_default_lins("alex", ALEX_CHANNELS))

    if not out:
        ap.error("no weight source given (--from-torchvision / --vgg-pth / "
                 "--alex-pth)")
    np.savez(args.out, **out)
    print(f"wrote {args.out}: {len(out)} arrays "
          f"({sum(v.size for v in out.values()) * 4 / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
