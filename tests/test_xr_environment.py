"""XR environment profiles, geometry generators, and effects tests."""

import json
import math

import numpy as np
import pytest

from desktop2stereo_tpu.xr.effects import (
    BackgroundCycler,
    PassthroughState,
    ambient_spill,
    border_glow_color,
    frost_lod,
    glow_band_mesh,
)
from desktop2stereo_tpu.xr.environment import (
    EnvironmentProfile,
    curve_mode_from_json,
    dark_room_profile,
    default_room,
    discover_environments,
    load_profile,
    panorama_sphere,
    parse_profile,
)
from desktop2stereo_tpu.xr.geometry import ScreenPose


def test_empty_profile_is_all_defaults():
    p = parse_profile({})
    assert p.glb == "environment.glb"
    assert not p.locked
    assert p.lighting.exposure == 1.0
    assert p.lighting.ambient_color == (0.08, 0.08, 0.09)
    assert p.view_poses == ()
    assert p.panorama is None


def test_profile_aliases_and_screen_lock():
    p = parse_profile({
        "display_name": {"EN": "Cinema", "CN": "电影院"},
        "position": [1, 2, 3],                      # alias of model_position
        "rotation_deg": [10, 0, 0],
        "khr_light_scale": 2.0,                     # alias
        "ambient_color": [0.1, 0.2, 0.3],           # alias
        "fallback_lights": [                        # alias of env_fill_lights
            {"position": [0, 2, -1], "color": [1, 1, 1], "range": 4.0},
        ],
        "screen": {"screen_width": 5.0, "screen_position": [0, 1.5, -6],
                   "curved": True},                 # legacy curve flag
        "view_pose": {"x": 0, "y": 1.6, "z": -2, "angle": 15},
    })
    assert p.name_for("CN") == "电影院"
    assert p.model_position == (1.0, 2.0, 3.0)
    assert p.lighting.khr_light_scale == 2.0
    assert p.lighting.ambient_color == (0.1, 0.2, 0.3)
    assert len(p.fill_lights) == 1 and p.fill_lights[0].range == 4.0
    assert p.locked
    assert p.screen.width == 5.0
    assert p.screen.curve_axis == "horizontal"  # legacy curved:true
    assert len(p.view_poses) == 1 and p.view_poses[0].angle_deg == 15.0


def test_curve_mode_parsing():
    assert curve_mode_from_json({"curve_axis": "vertical"}) == "vertical"
    assert curve_mode_from_json({"curve_axis": "NONE"}) == "none"
    assert curve_mode_from_json({"curved": True}) == "horizontal"
    assert curve_mode_from_json({"curved": False}) == "none"
    assert curve_mode_from_json({}) == "none"


def test_lighting_presets_inherit_base():
    p = parse_profile({
        "env_exposure": 0.5,
        "lighting_presets": [
            {"name": "Night", "env_exposure": 0.16},
            {"name": "Day"},
        ],
    })
    assert p.lighting.exposure == 0.5
    assert p.lighting_presets[0].lighting.exposure == 0.16
    # unspecified preset keys fall back to the profile's base lighting
    assert p.lighting_presets[1].lighting.exposure == 0.5


def test_discover_and_panorama(tmp_path):
    room = tmp_path / "MyRoom"
    room.mkdir()
    (room / "environment.glb").write_bytes(b"glTF")
    (room / "profile.json").write_text(json.dumps({"env_exposure": 0.7}))
    pano = tmp_path / "Beach"
    pano.mkdir()
    (pano / "sky.jpg").write_bytes(b"\xff\xd8")
    (pano / "profile.json").write_text(json.dumps({"type": "panorama"}))
    empty = tmp_path / "NotARoom"
    empty.mkdir()

    envs = discover_environments(str(tmp_path))
    assert set(envs) == {"MyRoom", "Beach"}
    assert envs["MyRoom"].lighting.exposure == 0.7
    assert envs["Beach"].panorama and envs["Beach"].panorama.endswith("sky.jpg")


def test_load_profile_bad_json(tmp_path):
    room = tmp_path / "Broken"
    room.mkdir()
    (room / "profile.json").write_text("{not json")
    p = load_profile(str(room))
    assert isinstance(p, EnvironmentProfile)
    assert p.lighting.exposure == 1.0


def test_default_room_geometry():
    tris = default_room(width=8.0, height=3.2, depth=10.0)
    assert tris.shape == (36, 8)  # 6 faces × 2 tris × 3 verts
    # floor at y=0, ceiling at height
    ys = tris[:, 1]
    assert ys.min() == 0.0 and ys.max() == pytest.approx(3.2)
    # normals are unit
    np.testing.assert_allclose(np.linalg.norm(tris[:, 3:6], axis=1), 1.0)


def test_panorama_sphere_geometry():
    tris = panorama_sphere(segments=16, rings=8, radius=50.0)
    assert tris.shape == (16 * 8 * 6, 5)
    r = np.linalg.norm(tris[:, :3], axis=1)
    np.testing.assert_allclose(r, 50.0, rtol=1e-5)
    assert tris[:, 3].min() >= 0.0 and tris[:, 3].max() <= 1.0


def test_dark_room_fallback():
    p = dark_room_profile()
    assert p.lighting.ambient_color[0] < 0.05
    assert not p.locked


def test_border_glow_and_spill():
    rgb = np.zeros((64, 64, 3), np.float32)
    rgb[:4] = [255.0, 0.0, 0.0]  # red top band
    c = np.asarray(border_glow_color(rgb, band_frac=0.0625, reduction=0.5))
    assert c[0] > 0.1 and c[1] == pytest.approx(0.0, abs=1e-6)
    spill, tint = ambient_spill(np.full((8, 8, 3), 255.0, np.float32), 2.0)
    assert float(spill) == pytest.approx(2.0, rel=1e-3)
    np.testing.assert_allclose(np.asarray(tint), 1.0, rtol=1e-5)


def test_glow_band_meshes():
    pose = ScreenPose(width=4.0, height=2.25, distance=3.0)
    flat = glow_band_mesh(pose, band=0.1, curved=False)
    assert flat.shape[1] == 6
    assert set(np.unique(flat[:, 5])) == {0.0, 1.0}  # inner/outer alpha
    curved = glow_band_mesh(pose, band=0.1, curved=True, segments=16)
    assert curved.shape[0] == 2 * 2 * 17
    # curved band bulges toward +z_local (z = r(1-cos a) ≥ 0 pre-rotation);
    # in world space (screen at -distance) all z must stay ≥ -distance
    assert curved[:, 2].min() >= -3.0 - 1e-6


def test_frost_and_cyclers():
    assert frost_lod(0.0) == 0.0
    assert frost_lod(1.0) == pytest.approx(6.0)
    assert frost_lod(0.25) == pytest.approx(3.0)
    bg = BackgroundCycler()
    c0 = bg.color
    c1 = bg.advance()
    assert c1 != c0
    pt = PassthroughState()
    assert pt.clear_color((0.1, 0.1, 0.1)) == (0.1, 0.1, 0.1)
    pt.toggle()
    assert pt.clear_color((0.1, 0.1, 0.1)) == (0.0, 1.0, 0.0)


def test_screen_state_persist_restore(tmp_path):
    from desktop2stereo_tpu.xr.persist import (
        persist_screen_state,
        restore_screen_state,
    )

    path = str(tmp_path / ".builtin_default.json")
    pose = ScreenPose(width=5.5, distance=4.2, pan_x=0.3, pan_y=-0.1,
                      yaw=0.12, pitch=-0.05)
    assert persist_screen_state(path, pose, curve_axis="horizontal",
                                preset_index=2)
    got = restore_screen_state(path)
    assert got is not None
    p2, curve, preset = got
    assert p2.width == pytest.approx(5.5) and p2.distance == pytest.approx(4.2)
    assert p2.yaw == pytest.approx(0.12)
    assert curve == "horizontal" and preset == 2

    # merge-don't-clobber: foreign profile keys survive a re-persist
    import json as _json
    with open(path) as f:
        prof = _json.load(f)
    prof["display_name"] = {"EN": "Mine"}
    with open(path, "w") as f:
        _json.dump(prof, f)
    persist_screen_state(path, pose.with_preset(0), preset_index=0)
    with open(path) as f:
        prof2 = _json.load(f)
    assert prof2["display_name"] == {"EN": "Mine"}

    # locked environments never persist
    assert not persist_screen_state(path, pose, locked=True)


def test_runtime_settings_persist(tmp_path):
    from desktop2stereo_tpu.core.config import load_settings
    from desktop2stereo_tpu.xr.persist import persist_runtime_settings

    path = str(tmp_path / "settings.yaml")
    with open(path, "w") as f:
        f.write("Model: Depth-Anything-V2-Small\nCustom Key: keepme\n")
    persist_runtime_settings(path, environment="Cinema", depth_strength=2.5,
                             crop_mode="manual", controller="QUEST")
    s = load_settings(path)
    assert s.model == "Depth-Anything-V2-Small"
    assert s.extra["Custom Key"] == "keepme"
    assert s.extra["Environment Model"] == "Cinema"
    assert s.extra["Crop Mode"] == "manual"
    assert s.extra["Controller Model"] == "QUEST"
    # Depth Strength is a first-class settings key → round-trips into it
    assert s.depth_strength == pytest.approx(2.5)
