"""Settings round-trip, registry sanity, runtime policy."""

import os

import numpy as np
import pytest
import yaml

from desktop2stereo_tpu.core.config import Settings, load_settings, save_settings
from desktop2stereo_tpu.core.registry import MODEL_REGISTRY, get_spec, is_metric
from desktop2stereo_tpu.core import runtime


def test_settings_yaml_roundtrip_preserves_unknown_keys(tmp_path):
    p = tmp_path / "settings.yaml"
    p.write_text(
        "Depth Model: Depth-Anything-V2-Small\n"
        "Depth Strength: 4.0\n"
        "IPD: 0.07\n"
        "Foreground Scale: 5\n"
        "Anti-aliasing: 2\n"
        "Language: CN\n"           # unknown to us — must survive
        "Controller Model: PICO\n",
        encoding="utf-8",
    )
    s = load_settings(p)
    assert s.model == "Depth-Anything-V2-Small"
    assert s.ipd == 0.07
    assert s.foreground_scale == 0.5  # /10 transform (reference utils.py:858)
    assert s.aa_strength == 4.0       # *2 transform (reference utils.py:859)
    assert s.extra["Language"] == "CN"

    save_settings(s.replace(depth_strength=2.5), p)
    data = yaml.safe_load(p.read_text())
    assert data["Language"] == "CN"
    assert data["Controller Model"] == "PICO"
    assert data["Depth Strength"] == 2.5


def test_settings_gbk_tolerance(tmp_path):
    p = tmp_path / "settings.yaml"
    p.write_bytes("Depth Model: Depth-Anything-V2-Small\nLanguage: 中文\n".encode("gbk"))
    s = load_settings(p)
    assert s.model == "Depth-Anything-V2-Small"


def test_registry_covers_reference_catalogue():
    # the reference's MODEL_MAPPING families (reference utils.py:732-817)
    expected = [
        "Depth-Anything-V2-Small", "Depth-Anything-V2-Large",
        "Depth-Anything-V2-Metric-Indoor-Base", "Distill-Any-Depth-Small",
        "depth-anything-small", "Video-Depth-Anything-Large",
        "Metric-Video-Depth-Anything-Small", "DA3-LARGE",
        "DA3NESTED-GIANT-LARGE", "InfiniDepth-Base", "dpt-dinov2-small-kitti",
        "dpt-hybrid-midas", "dpt-beit-large-512", "zoedepth-nyu-kitti",
        "DepthPro-Large",
    ]
    for name in expected:
        assert name in MODEL_REGISTRY, name
    assert len(MODEL_REGISTRY) >= 40


def test_registry_metric_flags_match_reference_keyword_rule():
    # reference depth.py:666-669 sniffs metric/kitti/nyu/depth-ai/da3
    assert is_metric("Depth-Anything-V2-Metric-Indoor-Small")
    assert is_metric("dpt-dinov2-large-kitti")
    assert is_metric("zoedepth-nyu")
    assert is_metric("DA3-SMALL")
    assert is_metric("depth-ai")
    assert not is_metric("Depth-Anything-V2-Small")
    assert not is_metric("Video-Depth-Anything-Base")


def test_spec_dims():
    s = get_spec("Depth-Anything-V2-Small")
    assert s.dims == (384, 12, 6, 1536)
    assert s.dpt_layers == (2, 5, 8, 11)
    assert s.patch_size == 14
    l = get_spec("Depth-Anything-V2-Large")
    assert l.dims == (1024, 24, 16, 4096)
    assert l.dpt_layers == (4, 11, 17, 23)
    assert get_spec("InfiniDepth-Large").patch_size == 16


def test_runtime_mesh_and_policy():
    policy = runtime.detect_policy()
    assert policy.num_devices >= 1
    mesh = runtime.make_mesh()
    assert set(mesh.axis_names) == {"data", "model"}
    # 8 virtual CPU devices from conftest XLA_FLAGS
    mesh2 = runtime.make_mesh(num_data=4, num_model=2)
    assert mesh2.devices.shape == (4, 2)


def test_upload_roundtrip():
    x = np.arange(12, dtype=np.float32).reshape(3, 4)
    y = runtime.upload(x)
    assert np.array_equal(np.asarray(y), x)


def test_factory_covers_every_registry_family():
    """Every family in the registry must have a factory dispatch branch."""
    import inspect

    from desktop2stereo_tpu.core.registry import MODEL_REGISTRY
    from desktop2stereo_tpu.models import factory

    src = inspect.getsource(factory.build_model)
    families = {spec.family for spec in MODEL_REGISTRY.values()}
    for fam in families:
        assert f'"{fam}"' in src, f"factory has no branch for family {fam!r}"


def test_resolution_menus_match_reference():
    """Per-model depth-resolution menus ≡ the reference's Model List
    (reference settings.yaml:5-314); unlisted families get a menu too."""
    import yaml

    from desktop2stereo_tpu.core.registry import MODEL_REGISTRY

    ref = yaml.safe_load(
        open("/root/reference/settings.yaml", encoding="utf-8"))["Model List"]
    for name, entry in ref.items():
        want = tuple(entry.get("resolutions", []))
        spec = MODEL_REGISTRY.get(name)
        assert spec is not None, name
        assert spec.resolutions == want, (name, spec.resolutions, want)
    # classic families the reference leaves unlisted still offer a menu
    assert MODEL_REGISTRY["dpt-large"].resolutions
    assert 384 in MODEL_REGISTRY["zoedepth-nyu"].resolutions
