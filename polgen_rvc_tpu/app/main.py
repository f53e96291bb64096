"""App launcher: python -m polgen_rvc_tpu.app.main [--port N] [--open] [--listen]

Mirrors the reference launcher semantics (app.py:46-77): default port 7860,
--port override, --open launches a browser, port-retry loop decrementing on
bind failure. --share (a public gradio tunnel in the reference) has no
dependency-free equivalent; it is accepted and reported as unavailable.
Binds 127.0.0.1 unless --listen is given (the API accepts filesystem paths,
so external exposure is opt-in).
"""

from __future__ import annotations

import sys
import webbrowser

DEFAULT_PORT = 7860
MAX_PORT_ATTEMPTS = 10


def get_port_from_args(argv=None) -> int:
    argv = argv if argv is not None else sys.argv
    if "--port" in argv:
        idx = argv.index("--port") + 1
        if idx < len(argv):
            return int(argv[idx])
    return DEFAULT_PORT


def main(argv=None):
    argv = argv if argv is not None else sys.argv
    from .ui.server import serve

    if "--share" in argv:
        print("[!] --share is not supported in this build (no tunnel service); "
              "serving locally only")
    host = "0.0.0.0" if "--listen" in argv else "127.0.0.1"
    port = get_port_from_args(argv)
    for _ in range(MAX_PORT_ATTEMPTS):
        try:
            if "--open" in argv:
                webbrowser.open(f"http://localhost:{port}")
            serve(port, host=host)
            break
        except OSError:
            print(f"could not bind port {port}, retrying on port {port - 1}...")
            port -= 1
        except KeyboardInterrupt:
            break


if __name__ == "__main__":
    main()
