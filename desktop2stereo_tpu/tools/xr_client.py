"""Workstation XR/stereo client: renders the xr/net.py frame protocol.

The missing half of the remote-XR design: `sinks/xr.py` publishes (rgb,
depth) from the TPU host; THIS program runs on the user's workstation,
polls frames, performs the per-eye DIBR warp at render time (the job the
reference does in its viewer fragment shader, reference viewer.py:386-631,
and per-eye in OpenXR, reference xr_viewer/implementation.py:1724-2063),
and presents:

- ``--present glfw``  moderngl + GLFW window, warp on the GPU (a compact
  GLSL port of the same DIBR math — parallax shift, 3-tap pre-smooth,
  edge falloff, disocclusion confidence, directional background inpaint);
- ``--present cv``    OpenCV window, CPU numpy warp;
- ``--present png``   offscreen PNG frames, CPU numpy warp (headless CI);
- ``--present auto``  first of the above that imports.

The CPU warp is pure numpy — a workstation needs no JAX to run this.  It
mirrors `ops/stereo.dibr_render` (itself validated against the reference
shader's behavior) so server-side Half-SBS and client-side warp agree.

Usage:
    python -m desktop2stereo_tpu.tools.xr_client --host <tpu-host> --port 1123
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Optional, Tuple

import numpy as np

from desktop2stereo_tpu.xr.filters import OneEuroFilter
from desktop2stereo_tpu.xr.geometry import ScreenPose
from desktop2stereo_tpu.xr.net import FrameNetClient


# --------------------------------------------------------------------------
# CPU per-eye DIBR warp (numpy mirror of ops/stereo.dibr_render)
# --------------------------------------------------------------------------

def _shift_cols(x: np.ndarray, off: int) -> np.ndarray:
    """x[:, j+off] with edge clamp (jnp ops/stereo._shift_cols convention)."""
    if off == 0:
        return x
    out = np.empty_like(x)
    if off > 0:
        off = min(off, x.shape[1])
        out[:, :x.shape[1] - off] = x[:, off:]
        out[:, x.shape[1] - off:] = x[:, -1:]
    else:
        off = min(-off, x.shape[1])
        out[:, off:] = x[:, :x.shape[1] - off]
        out[:, :off] = x[:, :1]
    return out


def _shift_rows(x: np.ndarray, off: int) -> np.ndarray:
    """x[i+off] with edge clamp."""
    if off == 0:
        return x
    out = np.empty_like(x)
    if off > 0:
        off = min(off, x.shape[0])
        out[:x.shape[0] - off] = x[off:]
        out[x.shape[0] - off:] = x[-1:]
    else:
        off = min(-off, x.shape[0])
        out[off:] = x[:x.shape[0] - off]
        out[:off] = x[:1]
    return out


def _sample_const_offset(d: np.ndarray, off_px: float) -> np.ndarray:
    """Bilinear sample of a constant fractional column offset."""
    lo = int(np.floor(off_px))
    frac = off_px - lo
    a = _shift_cols(d, lo)
    b = _shift_cols(d, lo + 1)
    return a * (1.0 - frac) + b * frac


def _gather_bilinear_w(img: np.ndarray, px: np.ndarray) -> np.ndarray:
    """Per-pixel bilinear gather along W; px [H,W] continuous coords."""
    W = img.shape[1]
    pxc = np.clip(px, 0.0, W - 1.0)
    i0 = np.floor(pxc).astype(np.int64)
    i1 = np.minimum(i0 + 1, W - 1)
    frac = (pxc - i0).astype(img.dtype)[..., None]
    rows = np.arange(img.shape[0])[:, None]
    return img[rows, i0] * (1.0 - frac) + img[rows, i1] * frac


def _smoothstep(x: np.ndarray) -> np.ndarray:
    return x * x * (3.0 - 2.0 * x)


def warp_eye(
    rgb: np.ndarray,            # [H,W,3] f32 0..255
    depth: np.ndarray,          # [H,W] f32 in [0,1] (1 = near)
    eye_offset: float,          # ±ipd/2 in UV units
    depth_strength: float = 1.0,
    convergence: float = 0.0,
    search_radius: int = 12,
    depth_tolerance: float = 0.012,
    edge_margin: float = 0.05,
) -> np.ndarray:
    """One eye of the DIBR warp — numpy mirror of ops/stereo.dibr_render
    (reference viewer.py:528-631 behavior): parallax gather + soft
    disocclusion blend with directional background inpaint."""
    H, W, _ = rgb.shape
    depth = depth.astype(np.float32)
    rgb = rgb.astype(np.float32)
    par_sign = 1.0 if eye_offset > 0 else -1.0

    d = (depth * 0.7
         + _sample_const_offset(depth, -par_sign * 1.5) * 0.15
         + _sample_const_offset(depth, +par_sign * 1.5) * 0.15)
    depth_inv = -d
    depth_shaped = depth_inv * (1.0 + 0.35 * (1.0 - d))

    u = (np.arange(W, dtype=np.float32) + 0.5)[None, :] / W
    ef = _smoothstep(np.clip(u / edge_margin, 0.0, 1.0))
    ef *= _smoothstep(np.clip((1.0 - u) / edge_margin, 0.0, 1.0))

    shift_uv = eye_offset * (depth_shaped + convergence) * depth_strength * ef
    px = np.arange(W, dtype=np.float32)[None, :] - shift_uv * W

    # disocclusion confidence from the depth jump along the parallax dir
    jump = np.abs(_sample_const_offset(depth, -par_sign * 2.0)
                  - _sample_const_offset(depth, +par_sign * 2.0))
    conf = _smoothstep(np.clip((jump - 0.04) / 0.06, 0.0, 1.0))
    conf = np.where((px < 0.0) | (px > W - 1.0), 1.0, conf)

    color = _gather_bilinear_w(rgb, px)

    # directional background inpaint (reference viewer.py:437-506)
    sweep = -par_sign
    colors = np.zeros_like(rgb)
    weights = np.zeros_like(d)
    cum = np.zeros_like(d)
    for i in range(1, search_radius + 1):
        off = int(sweep * i)
        s_dinv = 1.0 - _shift_cols(d[..., None], off)[..., 0]
        is_bg = s_dinv > depth_inv + depth_tolerance
        w = np.exp(-i * 0.15) * (1.0 + (s_dinv - depth_inv) * 10.0)
        w = np.where(is_bg & (cum <= 5.0), w, 0.0)
        colors += _shift_cols(rgb, off) * w[..., None]
        weights += w
        cum += w
    # opposite sweep where the forward one found little background
    need = weights < 2.0
    cum2 = np.zeros_like(d)
    for i in range(1, search_radius + 1):
        off = int(-sweep * i)
        s_dinv = 1.0 - _shift_cols(d[..., None], off)[..., 0]
        is_bg = s_dinv > depth_inv + depth_tolerance
        w = np.where(is_bg & (cum2 <= 5.0) & need, np.exp(-i * 0.2), 0.0)
        colors += _shift_cols(rgb, off) * w[..., None]
        weights += w
        cum2 += w
    found = weights > 0.01
    base = colors / np.maximum(weights, 1e-12)[..., None]
    # small vertical blend pass
    vc = base * 0.5
    vw = np.full_like(d, 0.5)
    for dy in (-2, 2):
        ok = (1.0 - _shift_rows(d, dy)) > depth_inv + depth_tolerance * 0.5
        w = np.where(ok, 0.25, 0.0)
        vc += _shift_rows(rgb, dy) * w[..., None]
        vw += w
    filled = np.where(found[..., None], vc / vw[..., None], rgb)

    return color + conf[..., None] * (filled - color)


def render_stereo(
    rgb_u8: np.ndarray, depth: Optional[np.ndarray],
    ipd: float, depth_strength: float, convergence: float,
    mode: str = "Full-SBS",
) -> np.ndarray:
    """(rgb, depth) → displayable stereo frame, uint8."""
    rgb = rgb_u8.astype(np.float32)
    if depth is None:
        left = right = rgb
    else:
        left = warp_eye(rgb, depth, -ipd / 2, depth_strength, convergence)
        right = warp_eye(rgb, depth, +ipd / 2, depth_strength, convergence)
    if mode == "Half-SBS":
        if left.shape[1] % 2:  # odd width (window capture): drop last col
            left, right = left[:, :-1], right[:, :-1]
        left = (left[:, 0::2] + left[:, 1::2]) * 0.5
        right = (right[:, 0::2] + right[:, 1::2]) * 0.5
    sbs = np.concatenate([left, right], axis=1)
    return np.clip(sbs + 0.5, 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# Presenters
# --------------------------------------------------------------------------

class PngPresenter:
    """Headless: write every frame to out_dir/frame_%05d.png."""

    gpu_warp = False

    def __init__(self, out_dir: str = "xr_frames"):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.count = 0

    def push(self, sbs_u8: np.ndarray) -> bool:
        from PIL import Image

        path = os.path.join(self.out_dir, f"frame_{self.count:05d}.png")
        Image.fromarray(sbs_u8).save(path)
        self.count += 1
        return True

    def close(self) -> None:
        pass


class CvPresenter:
    """OpenCV window (CPU warp)."""

    gpu_warp = False

    def __init__(self, title: str = "desktop2stereo XR client"):
        import cv2

        if not (os.environ.get("DISPLAY") or os.environ.get("WAYLAND_DISPLAY")
                or os.name == "nt"):
            # fail HERE so --present auto falls through to the png
            # presenter on headless hosts (imshow would only fail later)
            raise RuntimeError("no display for the OpenCV presenter")
        self._cv = cv2
        self.title = title

    def push(self, sbs_u8: np.ndarray) -> bool:
        self._cv.imshow(self.title, sbs_u8[..., ::-1])
        return (self._cv.waitKey(1) & 0xFF) not in (27, ord("q"))

    def close(self) -> None:
        self._cv.destroyAllWindows()


# GLSL port of the DIBR warp (the reference's viewer fragment shader role,
# reference viewer.py:386-631): runs per eye on the workstation GPU so
# warp rate is decoupled from the network frame rate.
_DIBR_FRAG = """
#version 330
uniform sampler2D u_color;
uniform sampler2D u_depth;
uniform float u_eye_offset;     // ±ipd/2 (uv units)
uniform float u_strength;
uniform float u_convergence;
uniform vec2  u_texel;
in vec2 v_uv;
out vec4 f_color;

float smoothstep01(float x) { x = clamp(x, 0.0, 1.0); return x*x*(3.0-2.0*x); }
float depth_at(vec2 uv) { return texture(u_depth, uv).r; }

void main() {
    float par = u_eye_offset > 0.0 ? 1.0 : -1.0;
    vec2 dx = vec2(u_texel.x, 0.0);
    float d = depth_at(v_uv) * 0.7
            + depth_at(v_uv - par * 1.5 * dx) * 0.15
            + depth_at(v_uv + par * 1.5 * dx) * 0.15;
    float depth_inv = -d;
    float shaped = depth_inv * (1.0 + 0.35 * (1.0 - d));
    float ef = smoothstep01(v_uv.x / 0.05) * smoothstep01((1.0 - v_uv.x) / 0.05);
    float shift = u_eye_offset * (shaped + u_convergence) * u_strength * ef;
    vec2 suv = vec2(v_uv.x - shift, v_uv.y);
    vec3 color = texture(u_color, clamp(suv, 0.0, 1.0)).rgb;

    float jump = abs(depth_at(v_uv - par * 2.0 * dx) - depth_at(v_uv + par * 2.0 * dx));
    float conf = smoothstep01((jump - 0.04) / 0.06);
    if (suv.x < 0.0 || suv.x > 1.0) conf = 1.0;

    // directional background inpaint, forward sweep + fallback
    vec3 acc = vec3(0.0); float wsum = 0.0;
    float sweep = -par;
    for (int i = 1; i <= 12; ++i) {
        vec2 o = v_uv + sweep * float(i) * dx;
        float sdinv = 1.0 - depth_at(o);
        if (sdinv > depth_inv + 0.012) {
            float w = exp(-float(i) * 0.15) * (1.0 + (sdinv - depth_inv) * 10.0);
            acc += texture(u_color, o).rgb * w;
            wsum += w;
            if (wsum > 5.0) break;
        }
    }
    if (wsum < 2.0) {
        for (int i = 1; i <= 12; ++i) {
            vec2 o = v_uv - sweep * float(i) * dx;
            float sdinv = 1.0 - depth_at(o);
            if (sdinv > depth_inv + 0.012) {
                float w = exp(-float(i) * 0.2);
                acc += texture(u_color, o).rgb * w;
                wsum += w;
                if (wsum > 5.0) break;
            }
        }
    }
    vec3 filled = wsum > 0.01 ? acc / wsum : texture(u_color, v_uv).rgb;
    f_color = vec4(mix(color, filled, conf), 1.0);
}
"""

_QUAD_VERT = """
#version 330
in vec2 in_pos;
in vec2 in_uv;
out vec2 v_uv;
void main() { v_uv = in_uv; gl_Position = vec4(in_pos, 0.0, 1.0); }
"""


class GlfwPresenter:
    """moderngl + GLFW: per-eye DIBR in a fragment shader, two viewports
    (the reference viewer's per-eye render, reference viewer.py:2551+)."""

    gpu_warp = True

    def __init__(self, ipd: float, depth_strength: float, convergence: float,
                 size: Tuple[int, int] = (1280, 720),
                 title: str = "desktop2stereo XR client"):
        import glfw
        import moderngl

        if not glfw.init():
            raise RuntimeError("glfw.init failed")
        glfw.window_hint(glfw.CONTEXT_VERSION_MAJOR, 3)
        glfw.window_hint(glfw.CONTEXT_VERSION_MINOR, 3)
        glfw.window_hint(glfw.OPENGL_PROFILE, glfw.OPENGL_CORE_PROFILE)
        self._glfw = glfw
        self._win = glfw.create_window(size[0], size[1], title, None, None)
        if self._win is None:
            glfw.terminate()
            raise RuntimeError("glfw window creation failed")
        glfw.make_context_current(self._win)
        self.ctx = moderngl.create_context()
        self.prog = self.ctx.program(vertex_shader=_QUAD_VERT,
                                     fragment_shader=_DIBR_FRAG)
        quad = np.array([-1, -1, 0, 1, 1, -1, 1, 1, -1, 1, 0, 0,
                         1, -1, 1, 1, 1, 1, 1, 0, -1, 1, 0, 0],
                        dtype=np.float32)
        self.vbo = self.ctx.buffer(quad.tobytes())
        self.vao = self.ctx.vertex_array(
            self.prog, [(self.vbo, "2f 2f", "in_pos", "in_uv")])
        self.params = (ipd, depth_strength, convergence)
        self._tex_c = None
        self._tex_d = None

    def _upload(self, rgb: np.ndarray, depth: Optional[np.ndarray]) -> None:
        h, w = rgb.shape[:2]
        if self._tex_c is None or self._tex_c.size != (w, h):
            self._tex_c = self.ctx.texture((w, h), 3)
            self._tex_d = self.ctx.texture((w, h), 1, dtype="f4")
        self._tex_c.write(np.ascontiguousarray(rgb))
        if depth is not None:
            self._tex_d.write(np.ascontiguousarray(depth, np.float32))

    def push_packet(self, rgb: np.ndarray, depth: Optional[np.ndarray]) -> bool:
        glfw = self._glfw
        if glfw.window_should_close(self._win):
            return False
        self._upload(rgb, depth)
        fw, fh = glfw.get_framebuffer_size(self._win)
        self.ctx.clear(0.0, 0.0, 0.0)
        ipd, strength, conv = self.params
        self._tex_c.use(0)
        self._tex_d.use(1)
        self.prog["u_color"] = 0
        self.prog["u_depth"] = 1
        self.prog["u_strength"] = strength
        self.prog["u_convergence"] = conv
        self.prog["u_texel"] = (1.0 / rgb.shape[1], 1.0 / rgb.shape[0])
        for eye, vp in ((-1, (0, 0, fw // 2, fh)), (+1, (fw // 2, 0, fw - fw // 2, fh))):
            self.ctx.viewport = vp
            self.prog["u_eye_offset"] = eye * ipd / 2
            self.vao.render()
        glfw.swap_buffers(self._win)
        glfw.poll_events()
        return True

    def close(self) -> None:
        self._glfw.terminate()


def make_presenter(kind: str, args) -> object:
    if kind == "auto":
        for cand in ("glfw", "cv", "png"):
            try:
                return make_presenter(cand, args)
            except Exception:
                continue
        raise SystemExit("no presenter available")
    if kind == "glfw":
        return GlfwPresenter(args.ipd, args.depth_strength, args.convergence)
    if kind == "cv":
        return CvPresenter()
    if kind == "png":
        return PngPresenter(args.out)
    raise SystemExit(f"unknown presenter {kind!r}")


# --------------------------------------------------------------------------
# Client loop
# --------------------------------------------------------------------------

def adopt_server_meta(args, meta: dict) -> None:
    """Fill stereo flags the user left unset from the server's advertised
    session config — the TPU host's settings.yaml then drives the remote
    render exactly as the reference's file drives its local viewer
    (reference utils.py:851-852).  Explicit flags win."""
    for flag, key in (("ipd", "ipd"), ("depth_strength", "depth_strength"),
                      ("convergence", "convergence")):
        if getattr(args, flag) is None:
            v = meta.get(key)
            setattr(args, flag, float(v) if v is not None else
                    {"ipd": 0.064, "depth_strength": 2.0,
                     "convergence": 0.01}[flag])


def run_client(args) -> int:
    client = FrameNetClient(host=args.host, port=args.port,
                            encoding=args.encoding)
    try:
        meta = client.meta()
    except Exception:
        meta = {}
    adopt_server_meta(args, meta)
    if args.verbose and meta:
        print(f"[xr-client] server session config: {meta}")
    presenter = make_presenter(args.present, args)
    # pose-noise smoothing for the latency OSD (reference OneEuro usage,
    # reference xr_viewer/input.py:474-530)
    lat_filter = OneEuroFilter(min_cutoff=0.5, beta=0.05)
    # virtual-screen policy lives server/client-agnostic in xr/geometry.py;
    # instantiating it here keeps the presets/pose math on the client path
    screen = ScreenPose()
    _ = screen.model_matrix()

    frames = 0
    t_last = time.perf_counter()
    try:
        while args.frames is None or frames < args.frames:
            pkt = client.poll(timeout=args.poll_timeout)
            if pkt is None:
                if args.frames is not None and args.idle_exit:
                    break
                continue
            now = time.perf_counter()
            dt = max(now - t_last, 1e-6)
            t_last = now
            latency_ms = lat_filter(dt * 1000.0, dt)
            if getattr(presenter, "gpu_warp", False):
                alive = presenter.push_packet(pkt.rgb, pkt.depth)
            else:
                sbs = render_stereo(pkt.rgb, pkt.depth, args.ipd,
                                    args.depth_strength, args.convergence,
                                    mode=args.mode)
                alive = presenter.push(sbs)
            frames += 1
            if args.verbose and frames % 30 == 0:
                print(f"[xr-client] seq {pkt.seq}, {1000.0/latency_ms:.1f} fps")
            if not alive:
                break
    finally:
        presenter.close()
        client.close()
    print(f"[xr-client] rendered {frames} frames")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="d2s-xr-client",
        description="workstation stereo/XR client for the d2s xr sink")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=1123)
    p.add_argument("--encoding", default="raw", choices=["raw", "jpeg"])
    p.add_argument("--present", default="auto",
                   choices=["auto", "glfw", "cv", "png"])
    p.add_argument("--mode", default="Full-SBS",
                   choices=["Full-SBS", "Half-SBS"])
    p.add_argument("--ipd", type=float, default=None,
                   help="default: the server's settings value, else 0.064")
    p.add_argument("--depth-strength", type=float, default=None,
                   help="default: the server's settings value, else 2.0")
    p.add_argument("--convergence", type=float, default=None,
                   help="default: the server's settings value, else 0.01")
    p.add_argument("--frames", type=int, help="stop after N frames")
    p.add_argument("--out", default="xr_frames", help="png presenter dir")
    p.add_argument("--poll-timeout", type=float, default=1.0)
    p.add_argument("--idle-exit", action="store_true",
                   help="exit when a bounded run sees no new frames")
    p.add_argument("--verbose", action="store_true")
    return p


def main(argv=None) -> int:
    return run_client(build_parser().parse_args(argv))


if __name__ == "__main__":
    raise SystemExit(main())
