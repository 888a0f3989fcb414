"""Load individual reference modules for golden-parity tests.

The reference package's ``src/adapters/__init__.py`` is broken (imports
symbols that don't exist — SURVEY.md §0), so modules are loaded file-by-file,
bypassing package __init__. Tests using this must skip when /root/reference is
absent.
"""

import importlib.util
import pathlib
import sys

REF = pathlib.Path("/root/reference")


def available() -> bool:
    return REF.exists()


def load(relpath: str, name: str):
    spec = importlib.util.spec_from_file_location(name, REF / relpath)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod
