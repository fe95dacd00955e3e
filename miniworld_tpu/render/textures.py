"""Texture atlas construction for the TPU raycaster.

Replaces GL texture objects (miniworld/opengl.py:102-194) with a single
uint8 atlas array ``(N, RES, RES, 3)`` uploaded once per env class.
Deviation from the reference renderer: sampling is nearest-neighbor at
a fixed resolution instead of trilinear mipmapping (GL), which testing
treats as a statistical — not bit-level — visual parity target.

Texture *names* resolve to variant file lists exactly like the
reference (``{name}_{1..9}.png``) so texture-variant domain
randomization selects among the same images.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import numpy as np
from PIL import Image

from miniworld_tpu.utils.assets import texture_variant_paths

# Texels per meter used to generate wall/floor UVs
# (reference: miniworld/miniworld.py:80).
TEX_DENSITY = 512

# Atlas tile resolution. 256 keeps the atlas small (a scene uses ~6-40
# textures -> a few MB) while staying visually close to the 512px
# sources at 80x60 observation sizes.
ATLAS_RES = 256


@functools.lru_cache(maxsize=None)
def texture_pixel_size(path: str) -> tuple:
    """(width, height) of a texture file, from the PNG header only."""
    with Image.open(path) as im:
        return im.size


@functools.lru_cache(maxsize=None)
def _load_tile(path: str, res: int) -> bytes:
    with Image.open(path) as im:
        im = im.convert("RGB")
        if im.size != (res, res):
            im = im.resize((res, res), Image.BILINEAR)
        return np.asarray(im, dtype=np.uint8).tobytes()


@dataclass
class TextureCatalog:
    """Accumulates texture files and assigns atlas indices.

    Scenes register *named slots* (e.g. a room's wall texture). Each
    slot maps to a contiguous run of atlas indices — one per variant
    file — so the device can pick ``base + randint(count)`` for
    texture-variant domain randomization (reference behavior:
    miniworld/opengl.py:136-140 picks uniformly among variants; without
    randomization variant 0 is used).
    """

    res: int = ATLAS_RES
    paths: list = field(default_factory=list)
    _path_idx: dict = field(default_factory=dict)
    slots: list = field(default_factory=list)  # (slot_name, base, count)
    _slot_idx: dict = field(default_factory=dict)

    def add_path(self, path: str) -> int:
        """Register a single file; returns its atlas index."""
        if path not in self._path_idx:
            self._path_idx[path] = len(self.paths)
            self.paths.append(path)
        return self._path_idx[path]

    def slot_for_name(self, tex_name: str) -> int:
        """Register a named texture slot (all variants); returns slot id."""
        if tex_name in self._slot_idx:
            return self._slot_idx[tex_name]
        variant_paths = texture_variant_paths(tex_name)
        base = self.add_path(variant_paths[0])
        for p in variant_paths[1:]:
            self.add_path(p)
        slot_id = len(self.slots)
        self.slots.append((tex_name, base, len(variant_paths)))
        self._slot_idx[tex_name] = slot_id
        return slot_id

    def slot_for_path(self, path: str) -> int:
        """Register a single-file slot (mesh textures, no variants)."""
        key = f"__path__:{path}"
        if key in self._slot_idx:
            return self._slot_idx[key]
        base = self.add_path(path)
        slot_id = len(self.slots)
        self.slots.append((key, base, 1))
        self._slot_idx[key] = slot_id
        return slot_id

    def uv_multiplier(self, tex_name: str) -> tuple:
        """(TEX_DENSITY/width, TEX_DENSITY/height) of variant 0.

        The reference derives UVs from the loaded variant's pixel size
        (miniworld/miniworld.py:83-120). We bake UVs with variant 0's
        size; variants of differing size would scale slightly
        differently under domain randomization (minor, documented).
        """
        w, h = texture_pixel_size(texture_variant_paths(tex_name)[0])
        return TEX_DENSITY / w, TEX_DENSITY / h

    def build_atlas(self) -> np.ndarray:
        """(N, res, res, 3) uint8 atlas of all registered files."""
        n = max(len(self.paths), 1)
        atlas = np.zeros((n, self.res, self.res, 3), dtype=np.uint8)
        for i, path in enumerate(self.paths):
            atlas[i] = np.frombuffer(_load_tile(path, self.res), dtype=np.uint8).reshape(
                self.res, self.res, 3
            )
        return atlas

    def slot_tables(self) -> tuple:
        """(base, count) int32 arrays indexed by slot id."""
        n = max(len(self.slots), 1)
        base = np.zeros(n, dtype=np.int32)
        count = np.ones(n, dtype=np.int32)
        for i, (_, b, c) in enumerate(self.slots):
            base[i] = b
            count[i] = c
        return base, count
