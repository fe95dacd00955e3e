#!/usr/bin/env python3
"""Generate TextFrame glyph textures from the NIST by_class dataset
(reference: scripts/copy_nist_chars.py).

Samples up to ``--variants`` random handwritten glyph images per
alphanumeric character from a NIST Special Database 19 ``by_class``
directory tree and writes them as
``textures/chars/ch_0x{ord}_{i}.png`` — the naming the texture-variant
domain randomization expects (utils/assets.py). The repository ships a
pre-generated set; this script only matters for regenerating it.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


import argparse
import random
import string
from pathlib import Path


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("nist_dir", help="path to NIST by_class directory")
    p.add_argument("--out", default="miniworld_tpu/assets/textures/chars")
    p.add_argument("--variants", type=int, default=9)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from PIL import Image

    rng = random.Random(args.seed)
    nist = Path(args.nist_dir)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    chars = string.digits + string.ascii_uppercase + string.ascii_lowercase
    for ch in chars:
        class_dir = nist / f"{ord(ch):x}"
        candidates = []
        if class_dir.is_dir():
            # NIST layout: by_class/<hex>/train_<hex>/ *.png
            candidates = sorted(class_dir.rglob("*.png"))
        if not candidates:
            print(f"skip {ch!r}: no images under {class_dir}")
            continue
        picks = rng.sample(candidates, min(args.variants, len(candidates)))
        for i, src in enumerate(picks, start=1):
            with Image.open(src) as im:
                im = im.convert("RGB")
                dst = out / f"ch_0x{ord(ch)}_{i}.png"
                im.save(dst)
        print(f"{ch!r}: wrote {len(picks)} variants")


if __name__ == "__main__":
    main()
