"""Stub pyglet.app (the shim never runs an event loop)."""


def run():
    raise RuntimeError("pyglet shim: no event loop")


def exit():
    pass
