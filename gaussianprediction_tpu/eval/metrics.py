"""Image-quality metric suite over render/gt pairs.

Twin of /root/reference/metrics.py:59-193: PSNR / SSIM / MS-SSIM / D-SSIM /
LPIPS(vgg, alex) per view, aggregated into results.json + per_view.json,
plus per-image squared-error maps. LPIPS needs pretrained VGG/AlexNet
weights, which cannot be downloaded in this offline environment — it is
computed when a weights file is available (eval/lpips.py) and reported as
null otherwise.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from gaussianprediction_tpu.utils.image import dssim, ms_ssim, psnr, ssim


def evaluate_pairs(
    renders: List[np.ndarray], gts: List[np.ndarray],
    names: Optional[List[str]] = None, compute_lpips: bool = True,
) -> Dict:
    """Compute the metric table over [H, W, 3] float image pairs.

    Returns {"mean": {...}, "per_view": {...}} with the reference's metric
    names (metrics.py:138-162)."""
    names = names or [f"{i:05d}.png" for i in range(len(renders))]
    lpips_fn = None
    if compute_lpips:
        from gaussianprediction_tpu.eval.lpips import try_load_lpips

        lpips_fn = try_load_lpips()
    per = {m: {} for m in
           ["SSIM", "MS-SSIM", "D-SSIM", "PSNR", "LPIPS-vgg", "LPIPS-alex"]}
    for name, r, g in zip(names, renders, gts):
        r = jnp.asarray(r, jnp.float32)
        g = jnp.asarray(g, jnp.float32)
        per["SSIM"][name] = float(ssim(r, g))
        if min(r.shape[0], r.shape[1]) >= 176:
            per["MS-SSIM"][name] = float(ms_ssim(r, g))
        else:  # too small for 5 dyadic scales
            per["MS-SSIM"][name] = None
        per["D-SSIM"][name] = float(dssim(r, g))
        per["PSNR"][name] = float(psnr(r, g))
        if lpips_fn is not None:
            lv, la = lpips_fn(np.asarray(r), np.asarray(g))
            per["LPIPS-vgg"][name] = lv
            per["LPIPS-alex"][name] = la
        else:
            per["LPIPS-vgg"][name] = None
            per["LPIPS-alex"][name] = None

    def mean_of(d):
        vals = [v for v in d.values() if v is not None]
        return float(np.mean(vals)) if vals else None

    mean = {m: mean_of(per[m]) for m in per}
    if lpips_fn is None and compute_lpips:
        # never leave LPIPS silently null: the architecture is implemented
        # (eval/lpips.py) but pretrained VGG/Alex weights cannot be
        # downloaded in an offline environment — README "LPIPS weights"
        mean["LPIPS-note"] = (
            "LPIPS unavailable: set GPT_LPIPS_WEIGHTS to a weights npz "
            "(tools/export_lpips_npz.py; needs torchvision once, offline "
            "environments cannot fetch the pretrained backbones)"
        )
    return {
        "mean": mean,
        "per_view": per,
    }


def write_error_maps(renders, gts, deltas_dir: str):
    """Per-image |render - gt| maps, twin of /root/reference/metrics.py:146-148
    (abs error x 255 saved as deltas/{idx:05d}.jpg)."""
    import imageio.v2 as imageio

    os.makedirs(deltas_dir, exist_ok=True)
    for idx, (r, g) in enumerate(zip(renders, gts)):
        err = np.abs(np.asarray(r, np.float32) - np.asarray(g, np.float32))
        u8 = (np.clip(err, 0.0, 1.0) * 255).astype(np.uint8)
        path = os.path.join(deltas_dir, f"{idx:05d}.jpg")
        try:
            imageio.imwrite(path, u8)
        except (ValueError, OSError):  # no JPEG plugin in this environment
            imageio.imwrite(os.path.join(deltas_dir, f"{idx:05d}.png"), u8)


def evaluate_dirs(renders_dir: str, gt_dir: str, out_dir: Optional[str] = None,
                  resize_ratio: float = 1.0) -> Dict:
    """evaluate() twin (metrics.py:113-178): read two image dirs, write
    results.json / per_view.json + per-image error maps next to them."""
    from gaussianprediction_tpu.data.image_io import load_image

    out_dir = out_dir or os.path.dirname(renders_dir.rstrip("/"))
    rnames = sorted(
        f for f in os.listdir(renders_dir) if "depth" not in f
    )
    gnames = sorted(os.listdir(gt_dir))
    renders, gts = [], []
    for f in rnames:
        img = load_image(os.path.join(renders_dir, f))
        if resize_ratio != 1.0:
            h, w = img.shape[:2]
            img = load_image(
                os.path.join(renders_dir, f),
                resize_wh=(int(w * resize_ratio), int(h * resize_ratio)),
            )
        renders.append(img)
    for f in gnames[: len(rnames)]:
        img = load_image(os.path.join(gt_dir, f))
        if resize_ratio != 1.0:
            h, w = img.shape[:2]
            img = load_image(
                os.path.join(gt_dir, f),
                resize_wh=(int(w * resize_ratio), int(h * resize_ratio)),
            )
        gts.append(img)
    results = evaluate_pairs(renders, gts, names=rnames)
    write_error_maps(renders, gts, os.path.join(out_dir, "deltas"))
    with open(os.path.join(out_dir, "results.json"), "w") as f:
        json.dump(results["mean"], f, indent=2)
    with open(os.path.join(out_dir, "per_view.json"), "w") as f:
        json.dump(results["per_view"], f, indent=2)
    return results


def results_table(result_dirs: Dict[str, str]) -> str:
    """show.py twin: aggregate results.json across scenes into a text table
    with per-metric averages."""
    rows = {}
    metrics_order = ["PSNR", "SSIM", "MS-SSIM", "D-SSIM", "LPIPS-vgg",
                     "LPIPS-alex"]
    for scene, d in result_dirs.items():
        path = os.path.join(d, "results.json")
        with open(path) as f:
            rows[scene] = json.load(f)
    header = ["scene"] + metrics_order
    lines = ["  ".join(f"{h:>12}" for h in header)]
    sums = {m: [] for m in metrics_order}
    for scene, r in rows.items():
        vals = []
        for m in metrics_order:
            v = r.get(m)
            vals.append("-" if v is None else f"{v:.4f}")
            if v is not None:
                sums[m].append(v)
        lines.append("  ".join(
            [f"{scene:>12}"] + [f"{v:>12}" for v in vals]
        ))
    avg = ["average"] + [
        f"{np.mean(sums[m]):.4f}" if sums[m] else "-" for m in metrics_order
    ]
    lines.append("  ".join(f"{v:>12}" for v in avg))
    return "\n".join(lines)
