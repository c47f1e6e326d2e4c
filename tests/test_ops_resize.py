"""Resize parity vs torch F.interpolate (the reference's resize engine)."""

import numpy as np
import pytest
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from desktop2stereo_tpu.ops.resize import resize, patch_aligned_size, resize_patch_aligned


def _torch_resize(x_nhwc, size, mode, ac=False, aa=False):
    t = torch.from_numpy(x_nhwc).permute(0, 3, 1, 2)
    kw = {"mode": mode}
    if mode in ("bilinear", "bicubic"):
        kw["align_corners"] = ac
        kw["antialias"] = aa
    return F.interpolate(t, size=size, **kw).permute(0, 2, 3, 1).numpy()


CASES = [
    ("bilinear", (48, 61), False, False),
    ("bilinear", (200, 300), False, False),
    ("bilinear", (48, 61), True, False),
    ("bilinear", (200, 300), True, False),
    ("bilinear", (48, 61), False, True),
    ("bicubic", (48, 61), False, False),
    ("bicubic", (200, 300), False, False),
    ("bicubic", (48, 61), False, True),
    ("bicubic", (37, 37), False, True),
    ("area", (48, 61), False, False),
    ("nearest", (48, 61), False, False),
]


@pytest.mark.parametrize("mode,size,ac,aa", CASES)
def test_resize_matches_torch(rng, mode, size, ac, aa):
    x = rng.standard_normal((1, 97, 131, 3)).astype(np.float32)
    ref = _torch_resize(x, size, mode, ac, aa)
    out = np.asarray(resize(jnp.asarray(x), size, mode=mode, align_corners=ac, antialias=aa))
    assert np.abs(ref - out).max() < 5e-4


def test_resize_2d_and_3d_layouts(rng):
    x = rng.standard_normal((64, 80)).astype(np.float32)
    out2 = np.asarray(resize(jnp.asarray(x), (32, 40)))
    out3 = np.asarray(resize(jnp.asarray(x[..., None]), (32, 40)))[..., 0]
    assert np.allclose(out2, out3, atol=1e-6)


def test_resize_patch_aligned_vs_actual_reference_source(rng):
    """Oracle = the reference's own _resize_patch_aligned_t, AST-extracted
    from /root/reference/depth.py (CUDA branch: bicubic+antialias)."""
    from tests.reference_loader import load_reference_functions

    ns = load_reference_functions(
        "depth.py", ["_resize_patch_aligned_t"],
        globals_extra={"IS_XPU": False, "IS_CUDA": True, "DEVICE": "cpu"})

    x = rng.standard_normal((1, 360, 640, 3)).astype(np.float32)
    want = ns["_resize_patch_aligned_t"](
        torch.from_numpy(x).permute(0, 3, 1, 2), 252, 14
    ).permute(0, 2, 3, 1).numpy()
    got = np.asarray(resize_patch_aligned(jnp.asarray(x), 252, 14))
    assert got.shape == want.shape
    assert np.abs(got - want).max() < 5e-4


def test_patch_aligned_size_matches_reference_geometry():
    # 1080p → target 384, patch 14 (reference depth.py:676-695 math):
    # scale 0.2 → (216, 384) → nearest 14-multiples (210, 378)
    assert patch_aligned_size(1080, 1920, 384, 14) == (210, 378)
    # 4K → 518, patch 14
    h, w = patch_aligned_size(2160, 3840, 518, 14)
    assert h % 14 == 0 and w % 14 == 0
    assert abs(w - 518) <= 7
    # square already aligned
    assert patch_aligned_size(518, 518, 518, 14) == (518, 518)


def test_resize_patch_aligned_vs_torch(rng):
    x = rng.random((1, 120, 214, 3)).astype(np.float32)
    out = np.asarray(resize_patch_aligned(jnp.asarray(x), 98, 14))
    nh, nw = patch_aligned_size(120, 214, 98, 14)
    ref = _torch_resize(x, (nh, nw), "bicubic", False, True)
    assert out.shape[1:3] == (nh, nw)
    assert np.abs(ref - out).max() < 5e-4


@pytest.mark.parametrize("target", [128, 720])
def test_process_vs_actual_reference_source(rng, target):
    """Oracle = the reference's own GPU-path process() (BGRA->RGB +
    even-aligned bilinear+antialias downscale), AST-extracted from inside
    its `if IS_CUDA:` guard (reference depth.py:540-566).  target=720 >= H
    exercises the no-resize early return."""
    from tests.reference_loader import load_reference_functions

    from desktop2stereo_tpu.ops.normalize import process

    ns = load_reference_functions(
        "depth.py", ["process"],
        globals_extra={"DEVICE": "cpu", "DTYPE": torch.float32})

    frame = (rng.random((360, 640, 4)) * 255).astype(np.uint8)
    want = ns["process"](torch.from_numpy(frame.copy()), target)
    want = want.permute(1, 2, 0).numpy()
    got = np.asarray(process(jnp.asarray(frame), target))
    assert got.shape == want.shape, (got.shape, want.shape)
    # 0-255 scale: 5e-3 abs = 2e-5 relative (resize kernel float rounding)
    assert np.abs(got - want).max() < (5e-3 if target < 360 else 0.0) + 1e-6


def test_resize_halved_matches_resize_then_pair_mean():
    """resize_halved (the fused tail's composed depth path) must equal
    bilinear-resize-to-full followed by a pair-mean squeeze, on both axes."""
    import numpy as np
    import jax.numpy as jnp

    from desktop2stereo_tpu.ops.resize import resize, resize_halved

    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.random((42, 70, 1)), jnp.float32)
    full = np.asarray(resize(d, (64, 96), mode="bilinear"))[..., 0]

    got_w = np.asarray(resize_halved(d, (64, 96), halve_axis=1))[..., 0]
    want_w = full.reshape(64, 48, 2).mean(2)
    np.testing.assert_allclose(got_w, want_w, atol=2e-6)

    got_h = np.asarray(resize_halved(d, (64, 96), halve_axis=0))[..., 0]
    want_h = full.reshape(32, 2, 96).mean(1)
    np.testing.assert_allclose(got_h, want_h, atol=2e-6)
