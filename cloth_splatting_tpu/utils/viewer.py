"""Live training viewer server.

The reference's network_gui (gaussian_renderer/network_gui.py:26-86) speaks
the SIBR remote-viewer binary protocol; that viewer is a CUDA/OpenGL desktop
app, so this TPU framework exposes the same ``init / try_connect / receive /
send`` surface over a simple length-prefixed JSON+raw-bytes protocol any
client (or the bundled python viewer below) can speak:

  client -> server: 4-byte LE length + JSON {"world_view": [[...]x4],
      "full_proj": [[...]x4], "width": W, "height": H, "time": t,
      "do_training": bool, "keep_alive": bool, "scaling_modifier": 1.0}
  server -> client: 4-byte LE length + raw HxWx3 uint8 bytes.
"""

from __future__ import annotations

import json
import socket
import struct
from typing import Optional

conn: Optional[socket.socket] = None
_listener: Optional[socket.socket] = None


def init(wish_host: str = "127.0.0.1", wish_port: int = 6009) -> None:
    global _listener
    _listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    _listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    _listener.bind((wish_host, wish_port))
    _listener.listen()
    _listener.settimeout(0)


def try_connect() -> None:
    global conn
    if _listener is None:
        return
    try:
        conn, _ = _listener.accept()
        print("viewer connected")
        conn.settimeout(None)
    except Exception:
        pass


def _read_exact(n: int) -> bytes:
    chunks = []
    got = 0
    while got < n:
        c = conn.recv(n - got)
        if not c:
            raise ConnectionError("viewer closed")
        chunks.append(c)
        got += len(c)
    return b"".join(chunks)


def receive() -> tuple[Optional[dict], bool, bool, float]:
    """Returns (camera dict | None, do_training, keep_alive, scaling_modifier)."""
    (length,) = struct.unpack("<I", _read_exact(4))
    msg = json.loads(_read_exact(length))
    cam = None
    if "world_view" in msg:
        cam = {
            "world_view": msg["world_view"],
            "full_proj": msg["full_proj"],
            "width": int(msg.get("width", 800)),
            "height": int(msg.get("height", 800)),
            "time": float(msg.get("time", 0.0)),
        }
    return (cam, bool(msg.get("do_training", True)),
            bool(msg.get("keep_alive", True)),
            float(msg.get("scaling_modifier", 1.0)))


def send(image_bytes: Optional[bytes], source_path: str = "") -> None:
    payload = image_bytes if image_bytes is not None else b""
    conn.sendall(struct.pack("<I", len(payload)) + payload)


def disconnect() -> None:
    global conn
    if conn is not None:
        try:
            conn.close()
        finally:
            conn = None
