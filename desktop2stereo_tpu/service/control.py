"""Web control panel: the reference GUI's job on a headless TPU host.

The reference ships a Flet desktop GUI that edits settings.yaml, spawns the
worker as a subprocess, stops it via a stop.request file (Windows) or
process-group SIGINT with a kill escalation, and tees its output into a
rolling log (reference gui.py:1325-3699, 3478-3568).  A TPU host has no
desktop; the same controls are served as a small stdlib HTTP panel:

  python -m desktop2stereo_tpu.service.control --port 8700

  GET  /            settings form (model/resolution/mode/... dropdowns)
  POST /start       write settings.yaml, spawn the CLI worker subprocess
  POST /stop        graceful stop (stop.request file → SIGINT → SIGKILL)
  GET  /status      {"running": bool, "pid": int|null}
  GET  /logs        tail of the rolling worker log
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import threading
import time
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from desktop2stereo_tpu.core.config import DISPLAY_MODES, Settings, load_settings, save_settings
from desktop2stereo_tpu.core.registry import MODEL_REGISTRY

LOG_PATH = "logs/worker.log"
STOP_FILE = "logs/stop.request"


class WorkerManager:
    """Spawn/stop the pipeline worker (reference gui.py:3210-3568)."""

    def __init__(self, settings_path: str = "settings.yaml"):
        self.settings_path = settings_path
        self.proc: Optional[subprocess.Popen] = None
        self.lock = threading.Lock()
        os.makedirs("logs", exist_ok=True)

    @property
    def running(self) -> bool:
        return self.proc is not None and self.proc.poll() is None

    def start(self, settings: Settings, source: str, sink: str,
              extra_args: "list[str] | None" = None) -> int:
        with self.lock:
            if self.running:
                raise RuntimeError("worker already running")
            save_settings(settings, self.settings_path)
            if os.path.exists(STOP_FILE):
                os.remove(STOP_FILE)
            log = open(LOG_PATH, "ab", buffering=0)
            cmd = [
                sys.executable, "-u", "-X", "faulthandler",
                "-m", "desktop2stereo_tpu.cli",
                "--settings", self.settings_path,
                "--source", source, "--sink", sink,
                "--stop-file", STOP_FILE,
            ] + (extra_args or [])
            self.proc = subprocess.Popen(
                cmd, stdout=log, stderr=subprocess.STDOUT,
                start_new_session=True,
            )
            return self.proc.pid

    def stop(self, grace_s: float = 8.0) -> bool:
        """stop.request file → SIGINT to the process group → SIGKILL
        (reference gui.py:3524-3568 escalation)."""
        with self.lock:
            if not self.running:
                return True
            proc = self.proc
        try:
            with open(STOP_FILE, "w") as f:
                f.write("stop")
        except OSError:
            pass
        deadline = time.monotonic() + grace_s / 2
        while time.monotonic() < deadline:
            if proc.poll() is not None:
                return True
            time.sleep(0.2)
        try:
            os.killpg(os.getpgid(proc.pid), signal.SIGINT)
        except (ProcessLookupError, PermissionError):
            pass
        deadline = time.monotonic() + grace_s / 2
        while time.monotonic() < deadline:
            if proc.poll() is not None:
                return True
            time.sleep(0.2)
        try:
            os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            pass
        return proc.poll() is not None


# Bilingual labels, the reference GUI's EN/中文 toggle (reference
# gui.py:570-604 keeps a translation dict and re-renders on switch).
_L10N = {
    "en": {
        "model": "Depth Model", "depth_res": "Depth Resolution",
        "out_res": "Output Resolution", "mode": "Display Mode",
        "strength": "Depth Strength", "ipd": "IPD",
        "source": "Source", "window": "Window Title", "cursor": "Cursor",
        "sink": "Sink", "audio": "Audio (rtmp)", "quant": "Quantization",
        "run": "Run", "stop": "Stop", "running": "running pid ",
        "stopped": "stopped", "lang_link": "中文",
    },
    "zh": {
        "model": "深度模型", "depth_res": "深度分辨率",
        "out_res": "输出分辨率", "mode": "显示模式",
        "strength": "深度强度", "ipd": "瞳距",
        "source": "输入源", "window": "窗口标题", "cursor": "光标",
        "sink": "输出", "audio": "音频 (rtmp)", "quant": "量化",
        "run": "运行", "stop": "停止", "running": "运行中 pid ",
        "stopped": "已停止", "lang_link": "English",
    },
}


def _form_page(settings: Settings, lang: str = "en") -> bytes:
    model_opts = "".join(
        f'<option {"selected" if n == settings.model else ""}>{n}</option>'
        for n in sorted(MODEL_REGISTRY)
    )
    mode_opts = "".join(
        f'<option {"selected" if m == settings.display_mode else ""}>{m}</option>'
        for m in DISPLAY_MODES
    )
    # per-model resolution menus (reference settings.yaml:5-314) for the
    # client-side dropdown swap when the model changes
    import json as _json

    res_menus = _json.dumps({
        n: list(s.resolutions) for n, s in MODEL_REGISTRY.items()
        if s.resolutions
    })
    # normalize BEFORE any interpolation: `lang` is user-controlled query
    # input and is echoed into HTML attributes below
    lang = "zh" if lang == "zh" else "en"
    L = _L10N[lang]
    other = "en" if lang == "zh" else "zh"
    html = f"""<!doctype html><html><head><meta charset="utf-8">
<title>desktop2stereo-tpu control</title>
<style>body{{font-family:sans-serif;background:#111;color:#eee;max-width:640px;margin:2em auto}}
label{{display:block;margin:.6em 0 .2em}}select,input{{width:100%;padding:.3em;background:#222;color:#eee;border:1px solid #444}}
button{{margin-top:1em;padding:.5em 2em}}#log{{white-space:pre-wrap;font-family:monospace;font-size:11px;background:#000;padding:1em;max-height:280px;overflow:auto}}
#lang{{float:right;color:#8cf}}</style>
</head><body>
<a id="lang" href="/?lang={other}">{L['lang_link']}</a>
<h2>desktop2stereo-tpu</h2>
<form method="post" action="/start?lang={lang}">
<label>{L['model']}</label><select name="model" id="model" onchange="syncRes()">{model_opts}</select>
<label>{L['depth_res']}</label><select name="depth_resolution" id="depth_resolution">
<option>{settings.depth_resolution}</option></select>
<label>{L['out_res']}</label><input name="output_resolution" value="{settings.output_resolution}">
<label>{L['mode']}</label><select name="display_mode">{mode_opts}</select>
<label>{L['strength']}</label><input name="depth_strength" value="{settings.depth_strength}">
<label>{L['ipd']}</label><input name="ipd" value="{settings.ipd}">
<label>{L['source']}</label><select name="source"><option>synthetic</option><option>screen</option><option>video</option><option>image</option></select>
<label>{L['window']}</label><input name="window_title" placeholder="(whole screen)">
<label>{L['cursor']}</label><select name="cursor"><option value="on">on</option><option value="off">off</option></select>
<label>{L['sink']}</label><select name="sink"><option>mjpeg</option><option>window</option><option>png</option><option>video</option><option>null</option><option>rtmp</option><option>xr</option></select>
<label>{L['audio']}</label><select name="audio"><option>auto</option><option>none</option></select>
<label>{L['quant']}</label><select name="quant"><option value="none">none (bf16)</option><option value="int8">int8</option></select>
<button type="submit">{L['run']}</button>
</form>
<form method="post" action="/stop?lang={lang}"><button type="submit">{L['stop']}</button></form>
<p id="status"></p><div id="log"></div>
<script>
const RES_MENUS = {res_menus};
const RUNNING = {json.dumps(L['running'])}, STOPPED = {json.dumps(L['stopped'])};
function syncRes(){{
 const model=document.getElementById('model').value;
 const sel=document.getElementById('depth_resolution');
 const menu=RES_MENUS[model];
 if(!menu) return;
 const cur=parseInt(sel.value);
 sel.innerHTML=menu.map(r=>`<option ${{r===cur?'selected':''}}>${{r}}</option>`).join('');
 if(!menu.includes(cur)){{
  // nearest menu entry to the old value, not a jump to max resolution
  const near=menu.reduce((a,b)=>Math.abs(b-cur)<Math.abs(a-cur)?b:a);
  sel.value=near;
 }}
}}
async function tick(){{
 const s=await (await fetch('/status')).json();
 document.getElementById('status').textContent=s.running?(RUNNING+s.pid):STOPPED;
 document.getElementById('log').textContent=await (await fetch('/logs')).text();
}}
setInterval(tick, 2000); tick(); syncRes();
</script></body></html>"""
    return html.encode()


def serve(port: int = 8700, settings_path: str = "settings.yaml",
          host: str = "127.0.0.1") -> ThreadingHTTPServer:
    manager = WorkerManager(settings_path)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _send(self, code: int, body: bytes, ctype: str = "text/html"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802
            parsed = urllib.parse.urlparse(self.path)
            if parsed.path in ("/", "/index.html"):
                settings = (
                    load_settings(settings_path)
                    if os.path.exists(settings_path) else Settings()
                )
                lang = urllib.parse.parse_qs(parsed.query).get(
                    "lang", ["en"])[0]
                self._send(200, _form_page(settings, lang))
            elif self.path == "/status":
                body = json.dumps({
                    "running": manager.running,
                    "pid": manager.proc.pid if manager.running else None,
                }).encode()
                self._send(200, body, "application/json")
            elif self.path == "/logs":
                try:
                    with open(LOG_PATH, "rb") as f:
                        f.seek(0, 2)
                        size = f.tell()
                        f.seek(max(0, size - 8192))
                        body = f.read()
                except OSError:
                    body = b""
                self._send(200, body, "text/plain")
            else:
                self._send(404, b"not found")

        def do_POST(self):  # noqa: N802
            length = int(self.headers.get("Content-Length", 0))
            fields = urllib.parse.parse_qs(self.rfile.read(length).decode())
            parsed = urllib.parse.urlparse(self.path)
            # normalize: the decoded value is echoed into a Location header
            lang = urllib.parse.parse_qs(parsed.query).get("lang", ["en"])[0]
            lang = "zh" if lang == "zh" else "en"

            def val(name, default):
                return fields.get(name, [default])[0]

            if parsed.path == "/start":
                base = (
                    load_settings(settings_path)
                    if os.path.exists(settings_path) else Settings()
                )
                settings = base.replace(
                    model=val("model", base.model),
                    depth_resolution=int(val("depth_resolution", base.depth_resolution)),
                    output_resolution=int(val("output_resolution", base.output_resolution)),
                    display_mode=val("display_mode", base.display_mode),
                    depth_strength=float(val("depth_strength", base.depth_strength)),
                    ipd=float(val("ipd", base.ipd)),
                )
                extra = []
                if val("window_title", ""):
                    extra += ["--window-title", val("window_title", "")]
                if val("cursor", "on") == "off":
                    extra += ["--no-cursor"]
                if val("audio", "auto") != "auto":
                    extra += ["--audio", val("audio", "auto")]
                if val("quant", "none") != "none":
                    extra += ["--quant", val("quant", "none")]
                try:
                    manager.start(settings, val("source", "synthetic"),
                                  val("sink", "mjpeg"), extra_args=extra)
                except RuntimeError as e:
                    self._send(409, str(e).encode())
                    return
            elif parsed.path == "/stop":
                manager.stop()
            else:
                self._send(404, b"not found")
                return
            self.send_response(303)
            self.send_header("Location", f"/?lang={lang}")
            self.end_headers()

    server = ThreadingHTTPServer((host, port), Handler)
    server.manager = manager  # for tests
    return server


def main() -> None:
    p = argparse.ArgumentParser(prog="d2s-control")
    p.add_argument("--port", type=int, default=8700)
    p.add_argument("--settings", default="settings.yaml")
    p.add_argument("--host", default="127.0.0.1",
                   help="bind address; the panel can start desktop capture, "
                        "so exposing it (e.g. 0.0.0.0) is an explicit opt-in")
    args = p.parse_args()
    server = serve(args.port, args.settings, host=args.host)
    print(f"[control] panel at http://{args.host}:{args.port}/")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.manager.stop()


if __name__ == "__main__":
    main()
