"""Generate the vendored style/content asset pack (assets/).

The reference ships JPEG style/content packs (AdaAttN/styles/ 41 images,
AdaAttN/contents/ 20, RTNSTV/styles/ and ReCoNet/styles/ 9 each) that we
cannot redistribute.  Instead we synthesize deterministic, self-made
procedural images — strongly textured "paintings" for styles (Gram/attention
targets need rich second-order statistics) and structured "scenes" for
contents — so every CLI runs out-of-the-box with no external files.

Usage: python tools/make_assets.py [out_dir]   (default: assets/)
"""

import os
import sys

import numpy as np


def _smooth_noise(rng, h, w, octaves=4, persistence=0.55):
    """Multi-octave value noise in [0, 1] (pure numpy, bilinear upsample)."""
    out = np.zeros((h, w), np.float32)
    amp, total = 1.0, 0.0
    for o in range(octaves):
        gh, gw = max(2, h >> (octaves - o)), max(2, w >> (octaves - o))
        grid = rng.random((gh, gw)).astype(np.float32)
        ys = np.linspace(0, gh - 1, h, dtype=np.float32)
        xs = np.linspace(0, gw - 1, w, dtype=np.float32)
        y0 = np.clip(ys.astype(int), 0, gh - 2)
        x0 = np.clip(xs.astype(int), 0, gw - 2)
        fy = (ys - y0)[:, None]
        fx = (xs - x0)[None, :]
        g = (grid[y0][:, x0] * (1 - fy) * (1 - fx)
             + grid[y0 + 1][:, x0] * fy * (1 - fx)
             + grid[y0][:, x0 + 1] * (1 - fy) * fx
             + grid[y0 + 1][:, x0 + 1] * fy * fx)
        out += amp * g
        total += amp
        amp *= persistence
    return out / total


def _palette(rng, n=5):
    hues = rng.random(n)
    sat = 0.5 + 0.5 * rng.random(n)
    val = 0.35 + 0.6 * rng.random(n)
    cols = []
    for h, s, v in zip(hues, sat, val):
        i = int(h * 6) % 6
        f = h * 6 - int(h * 6)
        p, q, t = v * (1 - s), v * (1 - f * s), v * (1 - (1 - f) * s)
        rgb = [(v, t, p), (q, v, p), (p, v, t),
               (p, q, v), (t, p, v), (v, p, q)][i]
        cols.append(rgb)
    return np.asarray(cols, np.float32)


def make_style(seed, h=256, w=256):
    """Painterly texture: palette-quantized flow noise + stroke streaks."""
    rng = np.random.default_rng(seed)
    base = _smooth_noise(rng, h, w, octaves=5)
    pal = _palette(rng, 4 + seed % 4)
    idx = np.clip((base * len(pal)).astype(int), 0, len(pal) - 1)
    img = pal[idx]
    # directional brush streaks: shear a fine noise layer
    streak = _smooth_noise(rng, h, w, octaves=6)
    shift = (np.arange(h) * (0.3 + 0.6 * rng.random())).astype(int) % w
    streak = np.take_along_axis(
        streak, (np.arange(w)[None, :] + shift[:, None]) % w, axis=1)
    img = img * (0.75 + 0.5 * streak[..., None])
    # impasto speckle
    img += 0.08 * rng.standard_normal((h, w, 1)).astype(np.float32)
    return np.clip(img * 255, 0, 255).astype(np.uint8)


def make_content(seed, h=256, w=256):
    """Structured scene: sky gradient + ridged terrain + blocky foreground."""
    rng = np.random.default_rng(1000 + seed)
    y = np.linspace(0, 1, h, dtype=np.float32)[:, None]
    sky_top = 0.4 + 0.5 * rng.random(3)
    sky_bot = 0.6 + 0.4 * rng.random(3)
    img = (sky_top * (1 - y) + sky_bot * y)[..., None].transpose(0, 2, 1)
    img = np.broadcast_to(img, (h, w, 3)).copy()
    # terrain silhouette layers
    for layer in range(3):
        ridge = _smooth_noise(rng, 4, w, octaves=3)[0]
        level = 0.45 + 0.17 * layer + 0.1 * ridge
        m = (y >= level[None, :]).astype(np.float32)[..., None]
        col = rng.random(3).astype(np.float32) * (0.6 - 0.15 * layer)
        img = img * (1 - m) + m * col
    # blocky foreground objects
    for _ in range(6):
        bh, bw = rng.integers(h // 10, h // 4), rng.integers(w // 12, w // 5)
        top = rng.integers(h // 2, h - bh)
        left = rng.integers(0, w - bw)
        img[top:top + bh, left:left + bw] = rng.random(3) * 0.9
    # light texture so perceptual losses have gradients everywhere
    img *= 0.9 + 0.2 * _smooth_noise(rng, h, w, octaves=5)[..., None]
    return np.clip(img * 255, 0, 255).astype(np.uint8)


def main(out_dir="assets"):
    from PIL import Image

    styles = os.path.join(out_dir, "styles")
    contents = os.path.join(out_dir, "contents")
    os.makedirs(styles, exist_ok=True)
    os.makedirs(contents, exist_ok=True)
    names = ["candy", "starry_night", "mosaic", "autoportrait", "composition",
             "edtaonisl", "sketch", "udnie", "wave"]
    for i, name in enumerate(names):
        Image.fromarray(make_style(i)).save(
            os.path.join(styles, f"{name}.png"), optimize=True)
    for i in range(6):
        Image.fromarray(make_content(i)).save(
            os.path.join(contents, f"scene_{i:02d}.png"), optimize=True)
    print(f"wrote {len(names)} styles + 6 contents under {out_dir}/")


if __name__ == "__main__":
    main(*sys.argv[1:2])
