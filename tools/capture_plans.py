#!/usr/bin/env python
"""Capture .explain("formatted") for every declared query -> plans/r06/.

Usage: python tools/capture_plans.py <suffix> [sf_dir] [only,names]
Writes plans/r06/<name>_<suffix>.txt for each declared query.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

    import __spark_entry__ as entry
    from hdtspark.session import get_spark

    spark = get_spark(app_name="capture-plans")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)

    for name, fn in entry.queries().items():
        if only is not None and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # noqa: BLE001 - capture, keep going
            text = f"ERROR capturing plan: {e!r}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(text)
        print(name, "ok" if "ERROR" not in text[:5] else "ERR", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
