#!/usr/bin/env python3
"""Entry point mirroring the reference's standalone `python simple_enhance.py`."""

from retinex_tpu.cli import simple_enhance_main

if __name__ == "__main__":
    simple_enhance_main()
