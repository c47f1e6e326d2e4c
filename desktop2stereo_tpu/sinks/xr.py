"""XR sink: publish (rgb, depth) to remote headset clients over TCP.

The reference's OpenXR mode hands each frame's color+depth to the
same-machine viewer for per-eye DIBR at render time (reference
main.py:1282-1318).  On a TPU host the headset workstation is remote, so
this sink drops frames into the latest-wins FrameServer and serves them
through xr.net; pair it with `--display-mode Mono` so the frame program
outputs the un-warped color (the client's renderer does the per-eye warp
with its own IPD, exactly like the reference viewer shader).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from desktop2stereo_tpu.xr.frame_server import FrameServer
from desktop2stereo_tpu.xr.net import FrameNetServer


class XrSink:
    # consumes depth: the engine fetches it asynchronously alongside sbs
    wants_depth = True

    def __init__(self, port: int = 1123, host: str = "0.0.0.0",
                 meta: Optional[dict] = None, inject_input: bool = True,
                 injector=None):
        """`meta` is the settings-derived session config advertised to
        clients (ipd/depth_strength/convergence/environment/controller) —
        see xr.net's meta query.

        `inject_input` wires the protocol's input channel into an OS
        injector (XTest) so headset clients drive THIS desktop — the
        reference's in-headset control loop (reference
        xr_viewer/input.py:121-390).  Headless hosts degrade to
        frames-only; the url string says which."""
        self.frames = FrameServer()
        self.bridge = None
        touch = None
        if injector is None and inject_input:
            from desktop2stereo_tpu.xr.injector import (make_injector,
                                                        make_touch_injector)

            injector = make_injector()
            if injector is not None:
                # real multitouch for the two-trigger pinch when the host
                # grants /dev/uinput (reference InjectTouchInput parity);
                # the bridge synthesizes ctrl+wheel zoom otherwise
                touch = make_touch_injector(injector.screen_size)
        if injector is not None:
            from desktop2stereo_tpu.xr.injector import InputBridge

            self.bridge = InputBridge(injector, touch_injector=touch)
        self._net = FrameNetServer(
            self.frames, host=host, port=port, meta=meta,
            on_input=self.bridge.handle if self.bridge else None).start()
        self.port = self._net.port
        self.host = host

    @property
    def url(self) -> str:
        # 0.0.0.0 is a bind address, not something a remote client can dial;
        # report the machine's hostname for the remote-workstation use case.
        host = self.host
        if host in ("0.0.0.0", ""):
            import socket

            host = socket.gethostname()
        inp = "input: XTest" if self.bridge else "input: none (headless)"
        return f"tcp://{host}:{self.port} (xr frame protocol, {inp})"

    def push(self, sbs_u8: np.ndarray, depth: Optional[np.ndarray],
             stats: dict) -> None:
        depth_np = None if depth is None else np.asarray(depth)
        self.frames.update_frame(np.asarray(sbs_u8), depth_np)

    def close(self) -> None:
        self._net.close()
        if self.bridge is not None:
            for inj in (self.bridge.touch_injector, self.bridge.injector):
                try:
                    if inj is not None:
                        inj.close()   # lifts stuck touches / releases keys
                except Exception:
                    pass
