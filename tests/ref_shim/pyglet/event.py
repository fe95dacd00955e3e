"""Stub pyglet.event."""

EVENT_HANDLED = True
EVENT_UNHANDLED = None


class EventDispatcher:
    def push_handlers(self, *a, **k):
        pass

    def dispatch_event(self, *a, **k):
        pass
