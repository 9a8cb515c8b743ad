#!/usr/bin/env python
"""Standalone optical-flow visualization (reference scripts/viz_flow.py).

Input: an npz with ``img_paths`` (frame image paths relative to ``--dir``)
and ``flow`` ([T-1, 2, H, W] or [T-1, H, W, 2] per-frame flow). For each
frame the script writes a side-by-side (image | flow-colorwheel) panel with
red quiver arrows at up-to-150 random pixels whose flow magnitude exceeds
1.5 px, into ``<dir>/debug_imgs/<i>.png``.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from cloth_splatting_tpu.eval.flow_viz import flow_to_image  # noqa: E402


def render_panels(img_paths, flows, rng=None) -> np.ndarray:
    """[T-1, H, W*2, 3] uint8 debug panels."""
    import imageio.v2 as imageio

    rng = rng or np.random.default_rng(0)
    panels = []
    for img_path, flo in zip(img_paths, flows):
        img = np.asarray(imageio.imread(img_path))[..., :3].astype(np.uint8)
        flo = np.asarray(flo)
        if flo.shape[0] == 2 and flo.ndim == 3:         # [2, H, W] -> HWC
            flo = flo.transpose(1, 2, 0)
        flow_img = flow_to_image(flo)
        panel = np.concatenate([img, flow_img], axis=1).copy()

        mag = np.sqrt(flo[..., 0] ** 2 + flo[..., 1] ** 2)
        ys, xs = np.nonzero(mag >= 1.5)
        if len(ys):
            sel = rng.choice(len(ys), size=min(150, len(ys)), replace=False)
            try:
                import cv2

                for y, x in zip(ys[sel], xs[sel]):
                    tip = (int(x + 2 * flo[y, x, 0]), int(y + 2 * flo[y, x, 1]))
                    cv2.arrowedLine(panel, (int(x), int(y)), tip,
                                    (255, 0, 0), 1, tipLength=0.3)
            except ImportError:     # cv2-less hosts still get the panels
                for y, x in zip(ys[sel], xs[sel]):
                    panel[y, x] = (255, 0, 0)
        panels.append(panel)
    return np.stack(panels)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("-i", "--input", type=str, required=True)
    parser.add_argument("-dir", "--dir", type=str, default=None)
    args = parser.parse_args(argv)

    data = np.load(args.input)
    base = args.dir or os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(args.input))))
    img_paths = [os.path.join(base, str(p)) for p in data["img_paths"]]
    flows = np.asarray(data["flow"])
    panels = render_panels(img_paths[:len(flows)], flows)

    out_dir = os.path.join(base, "debug_imgs")
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    import imageio.v2 as imageio

    for i, panel in enumerate(panels):
        imageio.imwrite(os.path.join(out_dir, f"{i}.png"), panel)
    print(f"wrote {len(panels)} panels to {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1:])
