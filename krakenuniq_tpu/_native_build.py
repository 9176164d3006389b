"""Build the kuniq_native C++ extension in place when it is missing or stale.

The compiled .so is not checked in; a fresh checkout only carries
native/kuniq_native.cpp + setup.py. Import sites call `ensure_native()`
to get the module, compiling it once on first use (a few seconds with -O3).
A stale .so (left behind by an older checkout) is detected via API_VERSION
and rebuilt; the rebuilt .so is loaded under a fresh module spec because
CPython cannot reload an extension module in place.
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys

_tried = False
_module = None

# bumped together with the C constant in native/kuniq_native.cpp whenever the
# extension's ABI changes; a stale in-place .so is rebuilt on import
API_VERSION = 6


def _find_so(pkg_dir: str) -> str | None:
    for name in os.listdir(pkg_dir):
        if name.startswith("kuniq_native.") and name.endswith(".so"):
            return os.path.join(pkg_dir, name)
    return None


def _load(path: str):
    # the module name's last component must stay "kuniq_native" so the loader
    # finds PyInit_kuniq_native; a rebuild writes a new inode, so dlopen does
    # not return the stale library
    spec = importlib.util.spec_from_file_location("krakenuniq_tpu.kuniq_native", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def ensure_native():
    """Return the kuniq_native module, (re)building it in place if needed."""
    global _tried, _module
    if _module is not None:
        return _module
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    so = _find_so(pkg_dir)
    if so is not None:
        try:
            mod = _load(so)
            if getattr(mod, "API_VERSION", 0) == API_VERSION:
                _module = mod
                return mod
        except ImportError:
            pass
    if _tried:
        return None
    _tried = True
    repo = os.path.dirname(pkg_dir)
    setup_py = os.path.join(repo, "setup.py")
    src = os.path.join(repo, "native", "kuniq_native.cpp")
    if not (os.path.exists(setup_py) and os.path.exists(src)):
        return None
    try:
        print("kuniq_native extension missing or stale; building...", file=sys.stderr)
        subprocess.run(
            [sys.executable, "setup.py", "build_ext", "--inplace", "--force"],
            cwd=repo,
            capture_output=True,
            timeout=600,
            check=True,
        )
    except (subprocess.SubprocessError, OSError) as e:
        print(f"kuniq_native build failed ({e}); using the Python host path", file=sys.stderr)
        return None
    so = _find_so(pkg_dir)
    if so is None:
        return None
    try:
        mod = _load(so)
    except ImportError:
        return None
    if getattr(mod, "API_VERSION", 0) != API_VERSION:
        return None
    _module = mod
    return mod
