"""Stub pyglet.graphics: vertex lists and batches that draw nothing."""


class _VertexList:
    def __init__(self, count):
        self.count = count

    def draw(self, mode=None):
        pass

    def delete(self):
        pass


def vertex_list(count, *data, **kwargs):
    return _VertexList(count)


def vertex_list_indexed(count, indices, *data, **kwargs):
    return _VertexList(count)


class Group:
    def __init__(self, *a, **k):
        pass


class OrderedGroup(Group):
    def __init__(self, order, *a, **k):
        super().__init__()
        self.order = order


class Batch:
    def draw(self):
        pass

    def add(self, *a, **k):
        return _VertexList(a[0] if a else 0)
