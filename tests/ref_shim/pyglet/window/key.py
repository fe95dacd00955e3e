"""Stub key symbols (values only need to be distinct)."""

_registry = {}


class KeyStateHandler(dict):
    def __missing__(self, k):
        return False


def __getattr__(name):
    if name not in _registry:
        _registry[name] = 0x1000 + len(_registry)
    return _registry[name]
