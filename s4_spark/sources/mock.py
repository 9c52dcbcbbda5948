"""Mock unix-socket servers — the reference's test fixtures rebuilt
(/root/reference/test/tool.go:44-69 UnixTestServer, :109-147
MockUnixEchoServer): deterministic producers for exercising the socket
source in tests and check queries."""

from __future__ import annotations

import os
import socket
import threading


def serve_payload_forever(sock_path: str, payload: bytes) -> threading.Thread:
    """Daemon server: send ``payload`` to every accepted connection, then
    close it. Idempotent across any number of reads — a re-run of the
    consuming query re-reads the same records (unlike the reference's
    one-shot fixtures, which made its tests order-dependent)."""
    if os.path.exists(sock_path):
        os.unlink(sock_path)
    srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    srv.bind(sock_path)
    srv.listen(8)

    def run() -> None:
        while True:
            try:
                conn, _ = srv.accept()
            except OSError:
                return
            try:
                conn.sendall(payload)
            except OSError:
                pass
            finally:
                conn.close()

    th = threading.Thread(target=run, daemon=True)
    th.start()
    return th
