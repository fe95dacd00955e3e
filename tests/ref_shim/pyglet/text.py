"""Stub pyglet.text.Label."""


class Label:
    def __init__(self, text="", **kwargs):
        self.text = text
        self.__dict__.update(kwargs)

    def draw(self):
        pass

    def delete(self):
        pass
