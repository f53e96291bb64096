"""First-party --share tunnel: loopback end-to-end (relay + app + browser).

The reference's --share is gradio's third-party FRP tunnel (app.py:49-60);
this build ships its own relay (app/share_tunnel.py). Zero egress here, so
all three roles run on loopback: a local HTTP "UI", the relay, the app-side
client dialing the relay, and an http.client "browser" hitting the relay's
public port.
"""

import http.client
import http.server
import socket
import threading
import time

import pytest

from polgen_rvc_tpu.app.share_tunnel import run_relay, start_share_client


def _free_port():
    s = socket.create_server(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


class _Handler(http.server.BaseHTTPRequestHandler):
    def do_GET(self):
        body = f"polgen:{self.path}".encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        body = b"echo:" + self.rfile.read(n)
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


def test_share_tunnel_roundtrip():
    ui_port, public_port, tunnel_port = _free_port(), _free_port(), _free_port()

    ui = http.server.ThreadingHTTPServer(("127.0.0.1", ui_port), _Handler)
    threading.Thread(target=ui.serve_forever, daemon=True).start()

    ready, stop = threading.Event(), threading.Event()
    threading.Thread(
        target=run_relay,
        args=(public_port, tunnel_port),
        kwargs={"host": "127.0.0.1", "ready_event": ready,
                "stop_event": stop},
        daemon=True,
    ).start()
    assert ready.wait(5.0)

    start_share_client(f"127.0.0.1:{tunnel_port}", ui_port)
    time.sleep(0.3)  # let the relay accept the tunnel

    try:
        # two sequential browser sessions through the public port
        for path in ("/", "/api/models"):
            conn = http.client.HTTPConnection("127.0.0.1", public_port,
                                              timeout=5)
            conn.request("GET", path)
            resp = conn.getresponse()
            assert resp.status == 200
            assert resp.read() == f"polgen:{path}".encode()
            conn.close()

        # a POST with a body (exercises DATA frames both ways)
        conn = http.client.HTTPConnection("127.0.0.1", public_port, timeout=5)
        payload = b"x" * 200_000  # multiple 64k frames
        conn.request("POST", "/convert", body=payload)
        resp = conn.getresponse()
        assert resp.status == 200
        assert resp.read() == b"echo:" + payload
        conn.close()

        # concurrent browsers (stream multiplexing)
        results = []

        def browse(i):
            c = http.client.HTTPConnection("127.0.0.1", public_port,
                                           timeout=5)
            c.request("GET", f"/s{i}")
            r = c.getresponse()
            results.append((r.status, r.read()))
            c.close()

        threads = [threading.Thread(target=browse, args=(i,))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(5.0)
        assert len(results) == 4
        assert all(s == 200 for s, _ in results)
        assert sorted(b for _, b in results) == sorted(
            f"polgen:/s{i}".encode() for i in range(4)
        )
    finally:
        stop.set()
        ui.shutdown()


def test_share_tunnel_handshake_flood_capped():
    """ADVICE r3: a connection flood on the public tunnel port must not
    accumulate unbounded handshake threads/fds — excess candidates beyond
    the slot cap are dropped immediately, and a legitimate client still
    attaches once the flood's sockets die."""
    ui_port, public_port, tunnel_port = _free_port(), _free_port(), _free_port()
    ui = http.server.ThreadingHTTPServer(("127.0.0.1", ui_port), _Handler)
    threading.Thread(target=ui.serve_forever, daemon=True).start()

    ready, stop = threading.Event(), threading.Event()
    threading.Thread(
        target=run_relay,
        args=(public_port, tunnel_port),
        kwargs={"host": "127.0.0.1", "ready_event": ready,
                "stop_event": stop, "secret": "hunter2"},
        daemon=True,
    ).start()
    assert ready.wait(5.0)

    idle = []
    try:
        # 8 silent connections occupy every handshake slot (each would
        # otherwise sit in the 5 s handshake timeout)
        for _ in range(8):
            idle.append(socket.create_connection(("127.0.0.1", tunnel_port)))
        time.sleep(0.3)
        # the 9th is dropped at accept time, well before any timeout
        extra = socket.create_connection(("127.0.0.1", tunnel_port))
        extra.settimeout(2.0)
        assert extra.recv(1) == b"", "flood overflow was not dropped"
        extra.close()
        # the flood dies; its slots free as the handshakes read EOF
        for s in idle:
            s.close()
        idle.clear()
        time.sleep(0.3)
        # a legitimate client attaches and serves
        start_share_client(f"127.0.0.1:{tunnel_port}", ui_port,
                           secret="hunter2")
        time.sleep(0.4)
        conn = http.client.HTTPConnection("127.0.0.1", public_port, timeout=5)
        conn.request("GET", "/after-flood")
        resp = conn.getresponse()
        assert (resp.status, resp.read()) == (200, b"polgen:/after-flood")
        conn.close()
    finally:
        for s in idle:
            s.close()
        stop.set()
        ui.shutdown()


def test_main_share_secret_requires_value():
    """ADVICE r3: `--share-secret` as the dangling last token must error
    out instead of silently falling back to the env/empty secret (which
    would later fail the relay handshake with a misleading message)."""
    from polgen_rvc_tpu.app.main import main

    with pytest.raises(SystemExit):
        main(["--share-secret"])


def test_share_tunnel_secret_and_reconnect():
    """Wrong-secret tunnels are rejected; the relay survives a tunnel death
    and serves again through a replacement (ADVICE round-2 hardening)."""
    ui_port, public_port, tunnel_port = _free_port(), _free_port(), _free_port()
    ui = http.server.ThreadingHTTPServer(("127.0.0.1", ui_port), _Handler)
    threading.Thread(target=ui.serve_forever, daemon=True).start()

    ready, stop = threading.Event(), threading.Event()
    threading.Thread(
        target=run_relay,
        args=(public_port, tunnel_port),
        kwargs={"host": "127.0.0.1", "ready_event": ready,
                "stop_event": stop, "secret": "hunter2"},
        daemon=True,
    ).start()
    assert ready.wait(5.0)

    def get(path, expect_ok=True):
        conn = http.client.HTTPConnection("127.0.0.1", public_port, timeout=5)
        try:
            conn.request("GET", path)
            resp = conn.getresponse()
            body = resp.read()
            return resp.status, body
        finally:
            conn.close()

    try:
        # 1) wrong secret: the missing relay OK ack surfaces as an error at
        #    the CLIENT (round-3 hardening — a rejected app must not report
        #    success), and the public port refuses service (no app attached)
        with pytest.raises(OSError):
            start_share_client(f"127.0.0.1:{tunnel_port}", ui_port,
                               secret="wrong")
        time.sleep(0.4)
        try:
            status, _ = get("/")
            assert False, f"expected closed connection, got {status}"
        except (http.client.HTTPException, OSError):
            pass

        # 2) right secret: serves
        t1 = start_share_client(f"127.0.0.1:{tunnel_port}", ui_port,
                                secret="hunter2")
        time.sleep(0.4)
        assert get("/") == (200, b"polgen:/")

        # 3) simulate an app crash: attach a raw (authenticated) tunnel that
        #    supersedes the live one, then kill it — the relay must notice
        #    the dead tunnel and accept a replacement that serves again
        from polgen_rvc_tpu.app.share_tunnel import _send_handshake

        dead = socket.create_connection(("127.0.0.1", tunnel_port))
        _send_handshake(dead, "hunter2")
        time.sleep(0.4)
        dead.close()  # app "restarts"
        time.sleep(0.4)
        start_share_client(f"127.0.0.1:{tunnel_port}", ui_port,
                           secret="hunter2")
        time.sleep(0.4)
        assert get("/again") == (200, b"polgen:/again")

        # 4) a STALE superseded tunnel dying must not sever the live
        #    replacement's browser connections (round-3 fix: drop_tunnel/
        #    demux teardown is scoped to the active tunnel). `stale` is
        #    superseded by the replacement below while its socket stays
        #    open; a keep-alive browser connection through the replacement
        #    must survive the stale socket's eventual death.
        stale = socket.create_connection(("127.0.0.1", tunnel_port))
        _send_handshake(stale, "hunter2")
        time.sleep(0.4)
        start_share_client(f"127.0.0.1:{tunnel_port}", ui_port,
                           secret="hunter2")
        time.sleep(0.4)
        raw = socket.create_connection(("127.0.0.1", public_port))
        try:
            raw.sendall(b"GET /b HTTP/1.0\r\n")  # incomplete: stream open
            time.sleep(0.3)
            stale.close()  # the superseded tunnel finally dies
            time.sleep(0.4)
            raw.sendall(b"\r\n")  # complete the request on the SAME stream
            raw.settimeout(5)
            resp = b""
            try:
                while True:
                    part = raw.recv(4096)
                    if not part:
                        break
                    resp += part
            except socket.timeout:
                pass
            assert b"polgen:/b" in resp, resp
        finally:
            raw.close()
    finally:
        stop.set()
        ui.shutdown()
