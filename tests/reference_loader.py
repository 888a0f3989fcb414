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


def load_with_ref_src(module_name: str):
    """Import a reference module that uses absolute ``src.*`` imports.

    Our repo ships its own ``src`` package (the CLI shim), so the reference's
    ``src`` tree is imported under isolation: existing src* modules are
    stashed, /root/reference is put at the head of sys.path, and the stash is
    restored afterwards. The loaded reference modules stay importable via the
    returned object only.
    """
    stash = {k: sys.modules.pop(k) for k in list(sys.modules)
             if k == "src" or k.startswith("src.")}
    sys.path.insert(0, str(REF))
    try:
        mod = importlib.import_module(module_name)
        loaded = {k: sys.modules[k] for k in list(sys.modules)
                  if k == "src" or k.startswith("src.")}
        for k in loaded:
            del sys.modules[k]
        return mod
    finally:
        sys.path.remove(str(REF))
        sys.modules.update(stash)
