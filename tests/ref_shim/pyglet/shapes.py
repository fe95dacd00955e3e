"""Stub pyglet.shapes: anything constructs, nothing draws."""


class _Shape:
    def __init__(self, *a, **k):
        self.opacity = 255
        self.visible = True

    def draw(self):
        pass

    def delete(self):
        pass


def __getattr__(name):
    if name[:1].isupper():
        return _Shape
    raise AttributeError(name)
