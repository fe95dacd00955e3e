"""Fake pyglet: lets /root/reference/miniworld run headless, GL-free.

The reference engine opens a GL context at construction
(miniworld/miniworld.py:509) and renders every step
(miniworld.py:800) — but its physics, RNG consumption, rewards and
terminations are pure numpy/Python. This shim no-ops the entire GL
surface (observations come back as zeros) so the ACTUAL reference code
can execute in-process and serve as the golden model for trajectory
parity tests (tests/test_ref_parity.py). Nothing here is imported by
the miniworld_tpu package itself.
"""

options = {"headless": False, "debug_gl": False}

from . import app, clock, event, gl, graphics, image, shapes, text, window  # noqa: E402,F401

version = "1.5.27-shim"
