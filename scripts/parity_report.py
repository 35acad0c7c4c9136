#!/usr/bin/env python
"""Reference-parity image check (SURVEY build-plan step 8).

Renders example scenes at their scripted default camera poses with the
reference's DEFAULT config (modules/config.js:4-16: 1 spp, 5 bounces,
temporal on/4, filter off, FXAA, HDR) and compares against the browser
screenshots shipped with the reference (/root/reference/screenshots):

  screen4.png  <- examples/emissive.js   (camera.z = -20)
  screen2.png  <- examples/dragon.js     (camera -10,14,-10 fx -0.9 fy 0.45)

Both renderers are unbiased MC estimators with different RNGs, so parity
is judged on the MEAN image: K output frames are averaged (the browser
shots themselves are temporal accumulations), both sides are box-downscaled
8x (washes residual MC noise, keeps lighting/geometry/color), and MAE /
PSNR / per-channel means are reported. Artifacts: docs/parity/*.png and
the metric table in docs/PARITY.md.

Run on the TPU: `python scripts/parity_report.py [frames]`.
"""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "examples"))

import numpy as np

from flexlight_tpu import Config
from flexlight_tpu.utils.image import write_png

SCREENS = "/root/reference/screenshots"
OUT_DIR = os.path.join(ROOT, "docs", "parity")

TARGETS = [
    # (scene module, screenshot, note)
    ("emissive", "screen4.png", "default camera (z=-20)"),
    ("dragon", "screen2.png", "default camera (-10,14,-10, fx=-0.9, fy=0.45)"),
]


def load_screen(name):
    from PIL import Image

    img = Image.open(os.path.join(SCREENS, name)).convert("RGB")
    return np.asarray(img, dtype=np.float32)


def downscale(img, f=8):
    h, w = img.shape[0] // f * f, img.shape[1] // f * f
    img = img[:h, :w]
    return img.reshape(h // f, f, w // f, f, -1).mean(axis=(1, 3))


def render_mean(mod_name, width, height, frames):
    import importlib

    mod = importlib.import_module(mod_name)
    engine = mod.build_scene()
    if isinstance(engine, tuple):
        engine = engine[0]
    engine.config = Config(temporal=True, temporal_samples=4, filter=False,
                           antialiasing="fxaa", hdr=True,
                           samples_per_ray=1, max_reflections=5)
    engine.canvas = (width, height)
    engine.renderer = "pathtracer"
    engine.renderer.render()
    acc = None
    for _ in range(frames):
        img = np.asarray(engine.renderer.render_frame(), dtype=np.float32)
        acc = img if acc is None else acc + img
    return acc / frames


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    os.makedirs(OUT_DIR, exist_ok=True)
    rows = []
    for scene, screen, note in TARGETS:
        ref = load_screen(screen)
        h, w = ref.shape[:2]
        got = render_mean(scene, w, h, frames)
        if got.max() <= 1.001:
            got = got * 255.0
        write_png(os.path.join(OUT_DIR, f"{scene}_tpu.png"),
                  got.astype(np.uint8))
        ref_s, got_s = downscale(ref), downscale(got)
        write_png(os.path.join(OUT_DIR, f"{scene}_ref_small.png"),
                  ref_s.astype(np.uint8))
        write_png(os.path.join(OUT_DIR, f"{scene}_tpu_small.png"),
                  got_s.astype(np.uint8))
        diff = np.abs(ref_s - got_s)
        write_png(os.path.join(OUT_DIR, f"{scene}_diff.png"),
                  np.clip(diff * 4, 0, 255).astype(np.uint8))
        mae = float(diff.mean())
        psnr = float(10 * np.log10(255.0 ** 2 / max((diff ** 2).mean(), 1e-9)))
        frac_off = float((diff.mean(axis=-1) > 25).mean())
        rows.append({
            "scene": scene, "screen": screen, "note": note,
            "mae_255": round(mae, 2), "psnr_db": round(psnr, 2),
            "frac_blocks_off_10pct": round(frac_off, 4),
            "ref_mean_rgb": [round(float(x), 1) for x in
                             ref_s.mean(axis=(0, 1))],
            "tpu_mean_rgb": [round(float(x), 1) for x in
                             got_s.mean(axis=(0, 1))],
        })
        print(rows[-1], flush=True)
    with open(os.path.join(ROOT, "docs", "PARITY.md"), "w") as fh:
        fh.write(
            "# Reference-output parity\n\n"
            "Rendered with the reference default config "
            "(modules/config.js:4-16) at each example's scripted camera "
            f"pose, {frames} output frames averaged, vs the browser "
            "screenshots in /root/reference/screenshots. Both sides "
            "box-downscaled 8x before metrics (different RNGs -> compare "
            "the converged mean, not per-pixel noise). Images in "
            "docs/parity/.\n\n"
            "| scene | screenshot | MAE/255 | PSNR (dB) | blocks >10% off "
            "| ref mean RGB | tpu mean RGB |\n|---|---|---|---|---|---|---|\n")
        for r in rows:
            fh.write(f"| {r['scene']} | {r['screen']} | {r['mae_255']} | "
                     f"{r['psnr_db']} | {r['frac_blocks_off_10pct']} | "
                     f"{r['ref_mean_rgb']} | {r['tpu_mean_rgb']} |\n")
        fh.write("\nCamera poses: " +
                 "; ".join(f"{s}: {n}" for s, _, n in TARGETS) + "\n")
    print("wrote docs/PARITY.md", flush=True)


if __name__ == "__main__":
    main()
