"""Every hdtspark module must import in a FRESH interpreter with no active
SparkSession (round 1 regression: a module-level Column in events_ops raised
at import before any session existed)."""

from __future__ import annotations

import pkgutil
import subprocess
import sys

import hdtspark


def test_all_modules_import_without_spark_session():
    mods = [m.name for m in pkgutil.iter_modules(hdtspark.__path__,
                                                 prefix="hdtspark.")]
    assert "hdtspark.events_ops" in mods
    code = (
        "import importlib\n"
        "from pyspark.sql import SparkSession\n"
        f"mods = {mods!r}\n"
        "for m in mods:\n"
        "    importlib.import_module(m)\n"
        "assert SparkSession.getActiveSession() is None\n"
        "print('IMPORTS_OK', len(mods))\n"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, cwd="/root/repo", timeout=300)
    assert "IMPORTS_OK" in out.stdout, out.stderr[-2000:]
