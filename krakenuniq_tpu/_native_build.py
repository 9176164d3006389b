"""Build the kuniq_native C++ extension in place when it is missing.

The compiled .so is not checked in; a fresh checkout only carries
native/kuniq_native.cpp + setup.py. Import sites call `ensure_native()`
to get the module, compiling it once on first use (a few seconds with -O3).
"""

from __future__ import annotations

import os
import subprocess
import sys

_tried = False


def ensure_native():
    """Return the kuniq_native module, building it in place if needed."""
    global _tried
    try:
        from . import kuniq_native

        return kuniq_native
    except ImportError:
        pass
    if _tried:
        return None
    _tried = True
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(pkg_dir)
    setup_py = os.path.join(repo, "setup.py")
    src = os.path.join(repo, "native", "kuniq_native.cpp")
    if not (os.path.exists(setup_py) and os.path.exists(src)):
        return None
    try:
        print("kuniq_native extension missing; building...", file=sys.stderr)
        subprocess.run(
            [sys.executable, "setup.py", "build_ext", "--inplace"],
            cwd=repo,
            capture_output=True,
            timeout=600,
            check=True,
        )
    except (subprocess.SubprocessError, OSError) as e:
        print(f"kuniq_native build failed ({e}); using the Python host path", file=sys.stderr)
        return None
    try:
        from . import kuniq_native

        return kuniq_native
    except ImportError:
        return None
