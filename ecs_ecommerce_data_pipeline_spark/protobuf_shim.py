"""Fallback activation for the vendored minimal protobuf runtime.

Spark 4's ``transformWithStateInPandas`` Python client requires
``google.protobuf`` (its generated ``StateMessage_pb2`` module speaks
the state-server protocol over it), but this environment has no
protobuf distribution and no network to fetch one — which left the
engine's primary stateful transport permanently on the
``applyInPandasWithState`` fallback (round-10 verdict task 5).

``ensure_protobuf()`` makes the vendored runtime under ``_vendor/``
importable:

* sys.path gets the vendor dir APPENDED — any real ``protobuf``
  install earlier on the path always wins;
* ``PYTHONPATH`` gets it appended too, so the Python workers Spark
  forks (which build their own interpreters from the inherited
  environment) resolve the same runtime — this must happen BEFORE the
  JVM launches, so ``session.get_spark`` calls it first.
"""

from __future__ import annotations

import importlib.util
import os

_VENDOR_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_vendor")


def _have_real_protobuf() -> bool:
    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except (ImportError, ModuleNotFoundError, ValueError):
        # find_spec("google.protobuf") raises when the parent `google`
        # namespace itself is missing
        return False


def ensure_protobuf() -> str:
    """Activate the vendored runtime if no protobuf is importable.

    Returns which runtime serves ``google.protobuf`` after the call:
    ``"installed"`` (a real distribution was already importable) or
    ``"vendored"``.  Idempotent."""
    if _have_real_protobuf():
        import sys

        return (
            "vendored"
            if _VENDOR_DIR in sys.path
            and getattr(
                sys.modules.get("google.protobuf"), "__file__", ""
            ).startswith(_VENDOR_DIR)
            else "installed"
        )
    import sys

    if _VENDOR_DIR not in sys.path:
        sys.path.append(_VENDOR_DIR)
    pp = os.environ.get("PYTHONPATH", "")
    parts = pp.split(os.pathsep) if pp else []
    if _VENDOR_DIR not in parts:
        os.environ["PYTHONPATH"] = (
            pp + os.pathsep + _VENDOR_DIR if pp else _VENDOR_DIR
        )
    return "vendored"
