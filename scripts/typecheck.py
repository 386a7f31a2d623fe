"""Type-check gate driver: mypy when installed, in-tree checker otherwise.

The reference gates its package with mypy (/root/reference/mypy.ini:1).
This environment ships no mypy wheel, so:

  - with mypy installed:  runs ``mypy`` with the committed mypy.ini;
  - without:              runs ``chessvision_tpu.typecheck`` (annotation
                          resolution + no-implicit-Optional over every
                          module), which the default pytest suite also
                          enforces (tests/test_typecheck.py).

Run: python scripts/typecheck.py
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> int:
    try:
        import mypy  # noqa: F401

        print("typecheck: running mypy (mypy.ini)")
        return subprocess.call(
            [sys.executable, "-m", "mypy", "--config-file", str(REPO / "mypy.ini")],
            cwd=REPO,
        )
    except ImportError:
        sys.path.insert(0, str(REPO))
        from chessvision_tpu.typecheck import main as fallback

        print("typecheck: mypy not installed — running the in-tree annotation gate")
        return fallback()


if __name__ == "__main__":
    sys.exit(main())
