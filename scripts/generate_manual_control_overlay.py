#!/usr/bin/env python3
"""Generate the manual-control docs illustration from a LIVE render.

Counterpart of the reference's hand-drawn Pillow mock
(reference scripts/generate_manual_control_overlay.py) — here the
illustration is a real engine frame: a first-person render with the
actual clickable HUD control panels (miniworld_tpu.hud) composited in,
annotated with the keyboard/mouse bindings of the interactive loop
(miniworld_tpu/manual_control.py).

    python scripts/generate_manual_control_overlay.py \
        [--out docs/images/manual_control_overlay.png]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

BINDINGS = [
    ("W / Up", "move forward"),
    ("S / Down", "move back"),
    ("A / D", "strafe left / right"),
    ("Left / Right", "turn"),
    ("Mouse (grabbed)", "look (yaw + pitch)"),
    ("Space / Return", "pickup / drop"),
    ("T", "toggle top view"),
    ("G", "start/stop recording"),
    ("Backspace", "reset episode"),
    ("Esc", "release pointer / quit"),
]


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="docs/images/manual_control_overlay.png")
    p.add_argument("--env", default="MiniWorld-ThreeRooms-v0")
    p.add_argument("--seed", type=int, default=7)
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from PIL import Image, ImageDraw, ImageFont

    from miniworld_tpu import hud
    from miniworld_tpu.gym_env import MiniWorldGym

    env = MiniWorldGym(args.env.replace("MiniWorld-", "").replace("-v0", ""),
                       obs_width=320, obs_height=240, show_controls=True,
                       render_mode="rgb_array")
    env.reset(seed=args.seed)
    frame = env.render()

    # side panel with the key bindings
    fh, fw = frame.shape[:2]
    panel_w = 300
    canvas = Image.new("RGB", (fw + panel_w, fh), (24, 28, 34))
    canvas.paste(Image.fromarray(np.asarray(frame)), (0, 0))
    draw = ImageDraw.Draw(canvas)
    try:
        font_b = ImageFont.truetype("DejaVuSans-Bold.ttf", 13)
        font = ImageFont.truetype("DejaVuSans.ttf", 12)
    except OSError:
        font_b = font = ImageFont.load_default()
    x = fw + 14
    y = 12
    draw.text((x, y), "manual_control.py", font=font_b, fill=(240, 248, 255))
    y += 22
    draw.text((x, y), "clickable HUD + keys:", font=font,
              fill=(170, 190, 210))
    y += 20
    for key, what in BINDINGS:
        draw.text((x, y), key, font=font_b, fill=(255, 214, 140))
        draw.text((x + 128, y), what, font=font, fill=(225, 232, 240))
        y += 18

    out = args.out
    os.makedirs(os.path.dirname(out), exist_ok=True)
    canvas.save(out)
    print(f"wrote {out} ({canvas.width}x{canvas.height})")


if __name__ == "__main__":
    main()
