#!/usr/bin/env python
"""Drop-in entry point matching the reference's launcher
(/root/reference/dither_pie.py): no arguments opens the GUI, any arguments
run the CLI."""

from dither_pie_tpu.__main__ import main

if __name__ == "__main__":
    main()
