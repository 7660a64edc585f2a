"""`python -m dither_pie_tpu.cli <config.json> [input_override]`."""

import sys

from dither_pie_tpu.cli.main import main

sys.exit(main())
