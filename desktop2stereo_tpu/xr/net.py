"""Network transport for the XR frame server: TPU host → workstation client.

The reference delivers frames to the headset through same-machine GPU
interop (reference xr_viewer/d3d11_backend.py, frame.py) — on a TPU host
the XR runtime lives on a REMOTE workstation, so the delivery layer is a
socket.  This is a small length-prefixed TCP protocol around
xr.frame_server.FrameServer with the same latest-wins semantics: a client
asks for "anything newer than seq N" and blocks briefly; a slow client
skips frames instead of queueing them.

Wire format (little-endian u32 lengths):
    request : one JSON line  {"last_seen": int, "timeout": float,
                              "encoding": "raw" | "jpeg"}\n
              or the session-config query  {"meta": true}\n
              or the input channel  {"input": [event, ...]}\n — the
              client→host half of the reference's drive-the-desktop loop
              (reference xr_viewer/input.py:121-390): events are handled
              by the server's `on_input` callback (normally
              xr/injector.py InputBridge → XTest) and acked with an empty
              response {"ok": true}
    response: [u32 header_len][header JSON][u32 rgb_len][rgb bytes]
              [u32 depth_len][depth bytes]
    header  : {"seq", "timestamp", "h", "w", "encoding", "depth": bool,
               "depth_encoding": "none" | "zu16", "dh", "dw"}
              (dh/dw are the depth map's own dims — depth usually rides at
              model/capture resolution while rgb may be an SBS composite)
              (meta query: {"meta": {...}} with both payloads empty)
    rgb     : raw HxWx3 u8, or a JPEG (quality 90)
    depth   : zlib-compressed u16 quantization of [0,1] (÷65535), or absent

The meta dict carries the server's settings-derived session config (ipd,
depth_strength, convergence, environment/controller model) so a client
left at defaults renders with the SAME stereo parameters the settings
file prescribes — the reference's single settings.yaml configures its
same-machine viewer the same way (reference utils.py:851-852, 1070-1071).

"jpeg" needs ~300 KB/frame at 1080p (LAN-friendly at 60 Hz); "raw" is for
loopback/10GbE.  A `seq`-only poll with no new frame returns header
{"seq": last_seen} and empty payloads.
"""

from __future__ import annotations

import json
import socket
import socketserver
import struct
import threading
import zlib
from typing import Optional

import numpy as np

from desktop2stereo_tpu.xr.frame_server import FramePacket, FrameServer

_U32 = struct.Struct("<I")


def _encode_rgb(rgb: np.ndarray, encoding: str) -> tuple:
    """→ (payload, encoding_actually_used).  The used encoding must travel
    in the header: silently shipping raw bytes under a \"jpeg\" label makes
    the client imdecode garbage and crash its poll loop."""
    if rgb.dtype != np.uint8:
        rgb = np.clip(rgb, 0, 255).astype(np.uint8)
    if encoding == "jpeg":
        import cv2

        ok, buf = cv2.imencode(".jpg", rgb[..., ::-1],
                               [int(cv2.IMWRITE_JPEG_QUALITY), 90])
        if ok:
            return buf.tobytes(), "jpeg"
    return np.ascontiguousarray(rgb).tobytes(), "raw"


def _encode_depth(depth: Optional[np.ndarray]) -> bytes:
    if depth is None:
        return b""
    q = np.clip(depth, 0.0, 1.0)
    u16 = (q * 65535.0 + 0.5).astype(np.uint16)
    return zlib.compress(u16.tobytes(), level=1)


def _decode_depth(buf: bytes, h: int, w: int) -> Optional[np.ndarray]:
    if not buf:
        return None
    u16 = np.frombuffer(zlib.decompress(buf), np.uint16).reshape(h, w)
    return u16.astype(np.float32) / 65535.0


def _read_exact(sock: socket.socket, n: int) -> bytes:
    out = b""
    while len(out) < n:
        chunk = sock.recv(n - len(out))
        if not chunk:
            raise ConnectionError("peer closed")
        out += chunk
    return out


class FrameNetServer:
    """Serves a FrameServer over TCP; one thread per client."""

    def __init__(self, frames: FrameServer, host: str = "0.0.0.0",
                 port: int = 1123, meta: Optional[dict] = None,
                 on_input=None):
        self.frames = frames
        self.meta = dict(meta or {})
        self.on_input = on_input
        self.inputs_received = 0
        outer = self

        class Handler(socketserver.StreamRequestHandler):
            def handle(self) -> None:
                while True:
                    line = self.rfile.readline()
                    if not line:
                        return
                    try:
                        req = json.loads(line)
                    except json.JSONDecodeError:
                        return
                    if isinstance(req.get("input"), list):
                        events = req["input"]
                        outer.inputs_received += len(events)
                        ok = outer.on_input is not None
                        if ok:
                            try:
                                outer.on_input(events)
                            except Exception:
                                ok = False
                        header = json.dumps({"ok": ok}).encode()
                        self.wfile.write(_U32.pack(len(header)) + header
                                         + _U32.pack(0) + _U32.pack(0))
                        self.wfile.flush()
                        continue
                    if req.get("meta"):
                        header = json.dumps({"meta": outer.meta}).encode()
                        self.wfile.write(_U32.pack(len(header)) + header
                                         + _U32.pack(0) + _U32.pack(0))
                        self.wfile.flush()
                        continue
                    last = int(req.get("last_seen", -1))
                    timeout = float(req.get("timeout", 1.0))
                    enc = req.get("encoding", "raw")
                    pkt = outer.frames.latest(last_seen=last, timeout=timeout)
                    self.wfile.write(outer._serialize(pkt, last, enc))
                    self.wfile.flush()

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server((host, port), Handler)
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(
            target=self._server.serve_forever, name="d2s-xr-net", daemon=True)

    @staticmethod
    def _serialize(pkt: Optional[FramePacket], last_seen: int,
                   encoding: str) -> bytes:
        if pkt is None:
            header = json.dumps({"seq": last_seen}).encode()
            return _U32.pack(len(header)) + header + _U32.pack(0) + _U32.pack(0)
        rgb_b, used_enc = _encode_rgb(pkt.rgb, encoding)
        dep_b = _encode_depth(pkt.depth)
        hdr = {
            "seq": pkt.seq, "timestamp": pkt.timestamp,
            "h": int(pkt.rgb.shape[0]), "w": int(pkt.rgb.shape[1]),
            "encoding": used_enc,
            "depth": pkt.depth is not None,
            "depth_encoding": "zu16" if pkt.depth is not None else "none",
        }
        if pkt.depth is not None:
            hdr["dh"] = int(pkt.depth.shape[0])
            hdr["dw"] = int(pkt.depth.shape[1])
        header = json.dumps(hdr).encode()
        return (_U32.pack(len(header)) + header
                + _U32.pack(len(rgb_b)) + rgb_b
                + _U32.pack(len(dep_b)) + dep_b)

    def start(self) -> "FrameNetServer":
        self._thread.start()
        return self

    def close(self) -> None:
        self._server.shutdown()
        self._server.server_close()


class FrameNetClient:
    """Blocking poll client for workstation XR viewers."""

    def __init__(self, host: str = "127.0.0.1", port: int = 1123,
                 encoding: str = "raw"):
        self.encoding = encoding
        self._sock = socket.create_connection((host, port), timeout=10.0)
        self._file = self._sock.makefile("rwb")
        self.last_seen = -1

    def _roundtrip(self, req: dict):
        self._file.write((json.dumps(req) + "\n").encode())
        self._file.flush()
        (hlen,) = _U32.unpack(_read_exact(self._sock, 4))
        header = json.loads(_read_exact(self._sock, hlen))
        (rlen,) = _U32.unpack(_read_exact(self._sock, 4))
        rgb_b = _read_exact(self._sock, rlen) if rlen else b""
        (dlen,) = _U32.unpack(_read_exact(self._sock, 4))
        dep_b = _read_exact(self._sock, dlen) if dlen else b""
        return header, rgb_b, dep_b

    def meta(self) -> dict:
        """Server session config (settings-derived stereo params)."""
        header, _, _ = self._roundtrip({"meta": True})
        return header.get("meta", {}) or {}

    def send_input(self, events: list) -> bool:
        """Ship OS-input events to the capture host (client→server half of
        the reference's in-headset desktop control).  Returns the server's
        ack — False when the host has no injector wired."""
        if not events:
            return True
        header, _, _ = self._roundtrip({"input": list(events)})
        return bool(header.get("ok"))

    def poll(self, timeout: float = 1.0) -> Optional[FramePacket]:
        """Newest frame newer than the last one seen, or None."""
        header, rgb_b, dep_b = self._roundtrip(
            {"last_seen": self.last_seen, "timeout": timeout,
             "encoding": self.encoding})
        if not rgb_b:
            return None
        h, w = header["h"], header["w"]
        if header.get("encoding") == "jpeg":
            import cv2

            dec = cv2.imdecode(np.frombuffer(rgb_b, np.uint8),
                               cv2.IMREAD_COLOR)
            if dec is None:   # corrupt/truncated jpeg: skip, don't crash
                return None   # the poll loop (the next frame supersedes it)
            rgb = dec[..., ::-1]
        else:
            rgb = np.frombuffer(rgb_b, np.uint8).reshape(h, w, 3)
        depth = _decode_depth(dep_b, int(header.get("dh", h)),
                              int(header.get("dw", w)))
        self.last_seen = int(header["seq"])
        return FramePacket(rgb, depth, self.last_seen,
                           float(header.get("timestamp", 0.0)))

    def close(self) -> None:
        try:
            self._file.close()
        finally:
            self._sock.close()
