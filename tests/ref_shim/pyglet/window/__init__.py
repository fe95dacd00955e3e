"""Stub pyglet.window: a Window that swallows everything."""

from . import key, mouse  # noqa: F401


class Window:
    def __init__(self, width=640, height=480, visible=True, resizable=False,
                 caption=None, config=None, fullscreen=False, **kwargs):
        self.width = width
        self.height = height
        self.visible = visible
        self.fullscreen = fullscreen
        self._handlers = {}

    # decorator form: @window.event
    def event(self, fn):
        self._handlers[fn.__name__] = fn
        return fn

    def __getattr__(self, name):
        # switch_to / clear / flip / dispatch_events / close /
        # set_fullscreen / set_mouse_visible / ... — all no-ops
        if name.startswith("_"):
            raise AttributeError(name)
        return lambda *a, **k: None
