"""XR frame-server core: geometry, filters, GLB parsing, frame mailbox."""

import json
import math
import struct
import threading

import numpy as np
import pytest

from desktop2stereo_tpu.xr.filters import OneEuroFilter, OneEuroFilter3D, slerp
from desktop2stereo_tpu.xr.frame_server import FrameServer
from desktop2stereo_tpu.xr.geometry import (
    CURVED_HALF_ANGLE_RAD,
    SCREEN_PRESETS,
    GrabState,
    ScreenPose,
)
from desktop2stereo_tpu.xr.glb import load_glb


# ---- geometry ----------------------------------------------------------------

def test_model_matrix_places_and_scales():
    pose = ScreenPose(width=4.0, height=2.0, distance=3.0, pan_x=0.5, pan_y=0.2)
    m = pose.model_matrix()
    # local corners [-1,1]² land at width/height extents around the center
    corner = m @ np.array([1.0, 1.0, 0.0, 1.0])
    np.testing.assert_allclose(corner[:3], [0.5 + 2.0, 0.2 + 1.0, -3.0], atol=1e-6)
    # rotation block stays orthonormal under arbitrary angles
    m2 = ScreenPose(yaw=0.7, pitch=-0.3, roll=0.2).rotation()[:3, :3]
    np.testing.assert_allclose(m2 @ m2.T, np.eye(3), atol=1e-6)


def test_curved_mesh_invariants():
    pose = ScreenPose(width=4.0, height=2.25, distance=3.0)
    verts = pose.curved_mesh(segments=48)
    assert verts.shape == ((48 + 1) * 2, 5)
    # the arc length matches the flat width (same image, bent not stretched)
    radius = (pose.width / 2.0) / CURVED_HALF_ANGLE_RAD
    assert radius * 2 * CURVED_HALF_ANGLE_RAD == pytest.approx(pose.width)
    # u runs 0→1 along the arc, v covers both rows
    assert verts[0, 3] == 0.0 and verts[-1, 3] == 1.0
    assert set(np.unique(verts[:, 4])) == {0.0, 1.0}
    # center of the arc sits at the pose distance; edges bow toward viewer
    mid = verts[48, :3]  # middle column, bottom row
    assert mid[2] == pytest.approx(-3.0, abs=1e-5)
    assert verts[0, 2] > mid[2]  # edge z is closer to 0 (further from screen)


def test_curved_mesh_vertical_axis():
    pose = ScreenPose(width=2.0, height=4.0)
    verts = pose.curved_mesh(segments=8, axis="vertical")
    assert verts.shape == (18, 5)
    # vertical arc: y varies along columns, x only across
    assert np.unique(np.round(verts[:, 0], 5)).size == 2


def test_presets_and_grab():
    pose = ScreenPose(width=4.0, height=2.25).with_preset(0)
    name, width, dist = SCREEN_PRESETS[0]
    assert pose.width == width and pose.distance == dist
    assert pose.width / pose.height == pytest.approx(4.0 / 2.25)

    grab = GrabState()
    grab.begin(pose, (0.0, 0.0, 0.0))
    moved = grab.update((0.3, -0.1, 0.5))
    assert moved.pan_x == pytest.approx(0.3)
    assert moved.pan_y == pytest.approx(-0.1)
    assert moved.distance == pytest.approx(dist - 0.5)


# ---- filters -------------------------------------------------------------------

def test_one_euro_smooths_jitter_tracks_motion():
    f = OneEuroFilter(min_cutoff=1.0, beta=0.02)
    rng = np.random.default_rng(0)
    # stationary signal + jitter → output variance shrinks
    xs = [f(1.0 + rng.normal(0, 0.05), 1 / 90) for _ in range(200)]
    assert np.var(xs[100:]) < 0.05 ** 2 / 4
    # fast ramp → tracks with bounded lag
    f.reset()
    for i in range(90):
        y = f(i * 0.1, 1 / 90)
    assert abs(y - 8.9) < 1.0

    f3 = OneEuroFilter3D()
    out = f3((1.0, 2.0, 3.0), 1 / 90)
    assert out == (1.0, 2.0, 3.0)  # first sample passes through


def test_slerp_endpoints_and_norm():
    q0 = np.array([0, 0, 0, 1.0])
    q1 = np.array([0, math.sin(math.pi / 4), 0, math.cos(math.pi / 4)])
    np.testing.assert_allclose(slerp(q0, q1, 0.0), q0, atol=1e-6)
    np.testing.assert_allclose(slerp(q0, q1, 1.0), q1, atol=1e-6)
    mid = slerp(q0, q1, 0.5)
    assert np.linalg.norm(mid) == pytest.approx(1.0, abs=1e-6)
    # half of a 90° yaw = 45° yaw
    assert mid[1] == pytest.approx(math.sin(math.pi / 8), abs=1e-6)


# ---- GLB ------------------------------------------------------------------------

def _tiny_glb() -> bytes:
    """One triangle under a translated node + a directional light."""
    positions = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    indices = np.array([0, 1, 2], np.uint16)
    binary = positions.tobytes() + indices.tobytes() + b"\x00\x00"  # pad to 4
    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0, 2]}],
        "nodes": [
            {"mesh": 0, "translation": [10, 0, 0], "name": "tri"},
            {"mesh": 0},  # unreachable (not in scene, no parent link) — skipped
            {"extensions": {"KHR_lights_punctual": {"light": 0}},
             "rotation": [0, 0, 0, 1]},
        ],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0}, "indices": 1, "material": 0}]}],
        "materials": [{"pbrMetallicRoughness": {
            "baseColorFactor": [0.5, 0.25, 0.125, 1.0]}}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 3, "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 6},
        ],
        "buffers": [{"byteLength": len(binary)}],
        "extensions": {"KHR_lights_punctual": {"lights": [
            {"type": "directional", "color": [1, 0.9, 0.8], "intensity": 2.5},
        ]}},
    }
    js = json.dumps(gltf).encode()
    js += b" " * (-len(js) % 4)
    total = 12 + 8 + len(js) + 8 + len(binary)
    return (struct.pack("<III", 0x46546C67, 2, total)
            + struct.pack("<II", len(js), 0x4E4F534A) + js
            + struct.pack("<II", len(binary), 0x004E4942) + binary)


def test_glb_parse_round_trip():
    scene = load_glb(_tiny_glb())
    tri = [p for p in scene.primitives if p.node_name == "tri"]
    assert len(tri) == 1 and len(scene.primitives) == 1
    # node translation applied to world-space positions
    np.testing.assert_allclose(tri[0].positions[0], [10, 0, 0], atol=1e-6)
    np.testing.assert_allclose(tri[0].positions[2], [10, 1, 0], atol=1e-6)
    assert tri[0].indices.tolist() == [0, 1, 2]
    assert tri[0].base_color == (0.5, 0.25, 0.125, 1.0)
    assert len(scene.lights) == 1
    light = scene.lights[0]
    assert light.kind == "directional" and light.intensity == 2.5
    np.testing.assert_allclose(light.direction, [0, 0, -1], atol=1e-6)
    lo, hi = scene.bounds
    np.testing.assert_allclose(lo, [10, 0, 0], atol=1e-6)
    np.testing.assert_allclose(hi, [11, 1, 0], atol=1e-6)


def test_glb_rejects_garbage():
    with pytest.raises(ValueError):
        load_glb(b"\x00" * 32)


# ---- frame server ----------------------------------------------------------------

def test_frame_server_latest_wins_and_wakeup():
    fs = FrameServer()
    assert fs.latest() is None
    for i in range(5):
        fs.update_frame(np.full((4, 4, 3), i, np.uint8))
    p = fs.latest()
    assert p.seq == 5 and p.rgb[0, 0, 0] == 4
    # already-seen sequence → None without blocking
    assert fs.latest(last_seen=p.seq) is None

    got = []

    def client():
        got.append(fs.latest(last_seen=p.seq, timeout=2.0))

    t = threading.Thread(target=client)
    t.start()
    fs.update_frame(np.zeros((4, 4, 3), np.uint8),
                    depth=np.ones((4, 4), np.float32))
    t.join(timeout=3.0)
    assert got and got[0].seq == 6 and got[0].depth.dtype == np.float32
    assert fs.geometry_for(16 / 9).height == pytest.approx(4.0 / (16 / 9))


def test_glb_accessor_without_bufferview_is_zero_filled():
    """glTF 2.0: an accessor missing `bufferView` reads as zeros (sparse
    base case) — never view 0's unrelated bytes."""
    from desktop2stereo_tpu.xr.glb import _accessor

    gltf = {
        "accessors": [
            {"componentType": 5126, "count": 4, "type": "VEC3"},
            {"componentType": 5123, "count": 7, "type": "SCALAR"},
        ],
        "bufferViews": [{"buffer": 0, "byteOffset": 0, "byteLength": 4}],
    }
    binary = b"\xff" * 4  # would be garbage if misread as view 0
    pos = _accessor(gltf, binary, 0)
    assert pos.shape == (4, 3) and not pos.any()
    idx = _accessor(gltf, binary, 1)
    assert idx.shape == (7,) and not idx.any()
