"""Build dist/hdtspark.zip for spark-submit --py-files."""

from __future__ import annotations

import os
import zipfile


def build(out: str = "dist/hdtspark.zip") -> str:
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    os.makedirs(os.path.join(root, "dist"), exist_ok=True)
    out_path = os.path.join(root, out)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for fn in sorted(os.listdir(pkg_dir)):
            if fn.endswith(".py"):
                z.write(os.path.join(pkg_dir, fn), f"hdtspark/{fn}")
    return out_path


if __name__ == "__main__":
    print(build())
