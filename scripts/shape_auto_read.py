#!/usr/bin/env python
"""Generate <shape> XML blocks for every OBJ in a folder (reference
scripts/shape_auto_read.py)."""

import argparse
import glob
import os

ap = argparse.ArgumentParser()
ap.add_argument("--mesh-dir", required=True)
ap.add_argument("--material", default="white")
ap.add_argument("--relative-to", default=".")
args = ap.parse_args()

for p in sorted(glob.glob(os.path.join(args.mesh_dir, "*.obj"))):
    rel = os.path.relpath(p, args.relative_to)
    print(f'''\t<shape type="obj">
\t\t<string name="filename" value="{rel}"/>
\t\t<ref type="material" id="{args.material}"/>
\t</shape>
''')
