"""Stub mouse button symbols."""

LEFT, MIDDLE, RIGHT = 1, 2, 4
