"""Make ``step_tpu`` importable when a script is run as ``python scripts/x.py``.

Python puts the *script's* directory (``scripts/``) on ``sys.path``, not the
repo root, so every script here imports this module first.  Relying on the
caller to export ``PYTHONPATH=/root/repo:$PYTHONPATH`` proved fragile: the
round-4 chip queue forgot it and seven queued runs burned their timeout
slots on ``ModuleNotFoundError`` (see .sweeps/chip_queue_r4.log).
"""

import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
