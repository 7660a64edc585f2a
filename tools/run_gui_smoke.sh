#!/usr/bin/env bash
# Run the display-gated GUI smoke tests under a virtual X server.
#
# The build container has no display and no Xvfb, so the three tkinter
# smoke tests in tests/test_gui_smoke.py skip there; every headless-able
# decision of the app is driven by tests/test_gui_viewmodel.py instead.
# On any machine with Xvfb (CI, a workstation):
#
#   sudo apt-get install -y xvfb   # once
#   tools/run_gui_smoke.sh
#
# xvfb-run allocates a throwaway X display, so this is safe on headless CI.
set -euo pipefail
cd "$(dirname "$0")/.."

if command -v xvfb-run >/dev/null 2>&1; then
    exec xvfb-run -a -s "-screen 0 1280x800x24" \
        python -m pytest tests/test_gui_smoke.py tests/test_gui_viewmodel.py -v
elif [ -n "${DISPLAY:-}" ]; then
    exec python -m pytest tests/test_gui_smoke.py tests/test_gui_viewmodel.py -v
else
    echo "No display and no xvfb-run; install xvfb or run on a desktop." >&2
    exit 2
fi
