"""Web-node static server.

The analogue of the reference's app/webroot/main.py (a Flask app serving
the static UI on a separate node from compute).  Our UI is self-authored
(chessvision_tpu/serve/webroot/index.html) — vanilla JS, no vendored
libraries — and talks to the compute endpoint's /cv_algo/ + /feedback/.

Run: python -m chessvision_tpu.serve.webroot_server --port 8000
"""

from __future__ import annotations

import argparse
import functools
import http.server
from pathlib import Path

WEBROOT = Path(__file__).parent / "webroot"


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--port", type=int, default=8000)
    args = parser.parse_args()
    handler = functools.partial(
        http.server.SimpleHTTPRequestHandler, directory=str(WEBROOT)
    )
    with http.server.ThreadingHTTPServer(("0.0.0.0", args.port), handler) as server:
        print(f"webroot on :{args.port} (serving {WEBROOT})")
        server.serve_forever()


if __name__ == "__main__":
    main()
