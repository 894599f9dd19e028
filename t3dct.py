"""Importable alias for the ``3deecelltracker_tpu`` package.

The distribution directory starts with a digit (mirroring the reference's
PyPI name ``3DeeCellTracker``), which is not a valid Python identifier, so
``import t3dct`` is the supported import path. The package registers itself
under this name in ``sys.modules`` on first import.
"""

import importlib
import sys

_pkg = importlib.import_module("3deecelltracker_tpu")
sys.modules[__name__] = _pkg
