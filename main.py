#!/usr/bin/env python3
"""Entry point mirroring the reference's `python main.py --mode {train,predict,enhance}`."""

from retinex_tpu.cli import main

if __name__ == "__main__":
    main()
