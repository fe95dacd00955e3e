"""No-op OpenGL surface for the reference shim.

Every ``gl*``/``glu*`` function accepts anything and returns 0; GL_*
constants materialize on demand with stable values. The only calls
with real contracts are ``glCheckFramebufferStatus`` (must return
GL_FRAMEBUFFER_COMPLETE to satisfy the FrameBuffer asserts,
reference opengl.py:260, 287, 316) and ``gl_info.have_extension``.
ctypes aliases are real ctypes types because the reference allocates
pixel buffers as ``(GLubyte * n)()`` (opengl.py:374-386) — those stay
zero-filled, so resolved frames are black, which is fine: the shim
exists for physics, not pixels.
"""

import ctypes

GLfloat = ctypes.c_float
GLdouble = ctypes.c_double
GLint = ctypes.c_int
GLuint = ctypes.c_uint
GLenum = ctypes.c_uint
GLubyte = ctypes.c_ubyte
GLushort = ctypes.c_ushort
GLboolean = ctypes.c_ubyte
GLsizei = ctypes.c_int

GL_FRAMEBUFFER_COMPLETE = 0x8CD5

_constants = {"GL_FRAMEBUFFER_COMPLETE": GL_FRAMEBUFFER_COMPLETE}


def _noop(*args, **kwargs):
    return 0


def glCheckFramebufferStatus(*args):
    return GL_FRAMEBUFFER_COMPLETE


class _GLInfo:
    def have_extension(self, name):
        return True

    def get_version(self):
        return "0.0 shim"

    def have_version(self, *a):
        return True


gl_info = _GLInfo()


class Config:
    def __init__(self, **kwargs):
        self.__dict__.update(kwargs)


def __getattr__(name):
    if name.startswith("GL_") or name.startswith("GLU_"):
        if name not in _constants:
            _constants[name] = 0x70000 + len(_constants)
        return _constants[name]
    if name.startswith(("gl", "glu")):
        return _noop
    raise AttributeError(name)
