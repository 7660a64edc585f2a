"""Entry router: no args -> GUI, args -> CLI (reference:
/root/reference/dither_pie.py:15-24)."""

import sys


def main():
    if len(sys.argv) > 1:
        from dither_pie_tpu.cli.main import main as cli_main

        sys.exit(cli_main())
    else:
        from dither_pie_tpu.gui.app import launch_gui

        launch_gui()


if __name__ == "__main__":
    main()
