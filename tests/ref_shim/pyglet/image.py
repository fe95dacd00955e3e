"""Stub pyglet.image backed by PIL for real texture dimensions.

Texture sizes feed the reference's texcoord generation
(miniworld.py:83-120 uses Texture.width/height), so dimensions are
read from the actual PNGs; pixel data is returned for completeness but
never reaches a framebuffer (gl.py is a no-op surface).
"""

from PIL import Image as _PILImage


class _Texture:
    target = 0x0DE1  # GL_TEXTURE_2D

    def __init__(self, width, height):
        self.id = 0
        self.width = width
        self.height = height


class ImageData:
    def __init__(self, width, height, fmt=None, data=None, pitch=None):
        self.width = width
        self.height = height
        self._fmt = fmt
        self._data = data

    def get_data(self, fmt="RGBA", pitch=None):
        if self._data is not None:
            return self._data
        return bytes(self.width * self.height * len(fmt or "RGBA"))

    def blit(self, *a, **k):
        pass


class _LoadedImage:
    def __init__(self, path):
        with _PILImage.open(path) as im:
            self.width, self.height = im.size
            self._rgba = im.convert("RGBA").tobytes()

    def get_texture(self):
        return _Texture(self.width, self.height)

    def get_image_data(self):
        return ImageData(self.width, self.height, "RGBA", self._rgba)

    def blit(self, *a, **k):
        pass


def load(path, *a, **k):
    return _LoadedImage(path)
