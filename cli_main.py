#!/usr/bin/env python
"""Launcher for spark-submit:

    python -m hdtspark.zip_build
    spark-submit --py-files dist/hdtspark.zip cli_main.py build \\
        --input <transcripts.parquet> --warehouse <dir>
"""
import sys

from hdtspark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
