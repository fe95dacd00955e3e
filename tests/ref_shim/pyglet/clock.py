"""Stub pyglet.clock."""


def schedule_interval(fn, interval, *a, **k):
    pass


def unschedule(fn):
    pass
