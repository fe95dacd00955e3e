"""Load the ACTUAL reference package (/root/reference/miniworld) with
the fake-pyglet shim (tests/ref_shim/pyglet) so its physics and task
logic run in-process as the golden model. Rendering is stubbed — all
observations come back black — but reset/step/reward/termination and
every np_random draw are the reference's real code paths.
"""

from __future__ import annotations

import os
import sys

REFERENCE_ROOT = "/root/reference"
_SHIM = os.path.join(os.path.dirname(os.path.abspath(__file__)), "ref_shim")


def load_reference():
    """Import and return the reference ``miniworld`` package (or None
    when /root/reference is absent — tests should skip then)."""
    if not os.path.isdir(os.path.join(REFERENCE_ROOT, "miniworld")):
        return None
    if _SHIM not in sys.path:
        sys.path.insert(0, _SHIM)
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    import miniworld  # noqa: F401

    return miniworld
