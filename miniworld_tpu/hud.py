"""Clickable HUD control overlays (reference: miniworld.py:1320-1574).

The reference draws button panels (move/strafe/look) either onto the
rgb_array observation via cv2 or as pyglet window shapes, and exposes
``control_boxes`` — a name -> pixel-rect dict the interaction layer
hit-tests clicks against. Envs can override the button set via
``control_action_map`` (CameraControl's pan/tilt/zoom panel,
cameracontrol.py:125-132).

This module draws the same panels with pure numpy (no cv2 dependency)
and provides the hit-test dict; manual_control.py consumes both.
"""

from __future__ import annotations

import numpy as np

# (label, action) — action is (component_index, value) into the 6-D
# action vector, matching the reference's default move/strafe/look set
DEFAULT_CONTROLS = [
    ("fwd", (0, 1.0)), ("back", (0, -1.0)),
    ("s.left", (1, -1.0)), ("s.right", (1, 1.0)),
    ("t.left", (2, -1.0)), ("t.right", (2, 1.0)),
    ("p.up", (3, 1.0)), ("p.down", (3, -1.0)),
    ("pick", (4, 1.0)), ("drop", (5, 1.0)),
]

def control_layout(width: int, height: int, labels) -> dict:
    """name -> (x0, y0, x1, y1) pixel boxes along the bottom edge."""
    n = len(labels)
    pad = max(2, width // 100)
    bw = (width - pad * (n + 1)) // max(n, 1)
    bh = max(10, height // 10)
    y1 = height - pad
    y0 = y1 - bh
    boxes = {}
    x = pad
    for name in labels:
        boxes[name] = (x, y0, x + bw, y1)
        x += bw + pad
    return boxes


def draw_controls(frame: np.ndarray, boxes: dict, hover: str | None = None,
                  pressed: str | None = None) -> np.ndarray:
    """Blend semi-transparent button rectangles into an RGB frame."""
    out = frame.copy()
    for name, (x0, y0, x1, y1) in boxes.items():
        if name == pressed:
            color, alpha = np.array([255, 200, 60]), 0.75
        elif name == hover:
            color, alpha = np.array([200, 200, 255]), 0.6
        else:
            color, alpha = np.array([60, 60, 80]), 0.45
        region = out[y0:y1, x0:x1].astype(np.float32)
        out[y0:y1, x0:x1] = (
            (1 - alpha) * region + alpha * color[None, None, :]
        ).astype(np.uint8)
        # 1px border
        out[y0, x0:x1] = 230
        out[y1 - 1, x0:x1] = 230
        out[y0:y1, x0] = 230
        out[y0:y1, x1 - 1] = 230
    return out


def hit_test(boxes: dict, x: int, y: int) -> str | None:
    """First control box containing the pixel (miniworld.py:1389-1391)."""
    for name, (x0, y0, x1, y1) in boxes.items():
        if x0 <= x <= x1 and y0 <= y <= y1:
            return name
    return None
