"""Where do the DPT decoder's milliseconds go?  (neck 1.11 + head 0.84 ms
at ViT-L 294x518 — benchmarks/model_split.py — vs a ~0.7 ms FLOP floor.)

Same methodology as encoder_split.py: in-graph A/B ablations of the SAME
neck/head, re-traced with one component stubbed, timed back-to-back in one
process.  FLOP accounting printed alongside:

  neck (fusion 256): scratch 3x3 convs 26.6 G + fusion PreActResiduals
  (4 scales, finest 84x148 -> 58.6 G) + reassembles + align-corners
  resizes ~= 115 G  => 0.58 ms MXU floor
  head: conv1 7.3 G @84x148, bilinear x3.5 to 294x518, 3x3 128->32
  lane-padded 44.9 G padded (11.2 useful), 1x1 -> ~58 G => ~0.3 ms floor
"""
from __future__ import annotations

import contextlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from desktop2stereo_tpu.core.runtime import detect_policy, setup_compilation_cache

setup_compilation_cache()
policy = detect_policy()

import flax.linen as nn
import jax
import jax.numpy as jnp

from desktop2stereo_tpu.core.registry import get_spec
from desktop2stereo_tpu.models import dpt as dpt_mod

try:
    from benchmarks._timing import sync, timeit
except ImportError:
    from _timing import sync, timeit

MH, MW = 294, 518
spec = get_spec("Depth-Anything-V2-Large")
HID = spec.dims[0]
GH, GW = MH // 14, MW // 14
FUSE = spec.fusion_channels

rng = np.random.default_rng(0)
grids = [jnp.asarray(rng.standard_normal((1, GH, GW, HID)),
                     policy.compute_dtype) for _ in range(4)]


@contextlib.contextmanager
def patched(**subs):
    saved = {}
    for name, repl in subs.items():
        saved[name] = getattr(dpt_mod, name)
        setattr(dpt_mod, name, repl)
    try:
        yield
    finally:
        for name, orig in saved.items():
            setattr(dpt_mod, name, orig)


class IdentityResidual(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        return x


def build_neck(variant: str):
    subs = {
        "base": {},
        "no_residual_convs": {"PreActResidual": IdentityResidual},
    }[variant]
    with patched(**subs):
        neck = dpt_mod.DPTNeck(neck_channels=list(spec.neck_channels),
                               fusion_channels=FUSE)
        params = neck.init(jax.random.PRNGKey(0), grids)
        fn = jax.jit(lambda p, g: neck.apply(p, g))
        out = fn(params, grids)
        jax.block_until_ready(out)
    return fn, params


def build_head(variant: str, fused):
    from desktop2stereo_tpu.ops import resize as resize_mod

    class NoPad(nn.Module):
        """3x3 conv WITHOUT lane padding (the pre-r04 narrow form)."""
        features: int
        kernel: tuple
        keep: "int | None" = None

        @nn.compact
        def __call__(self, x):
            return nn.Conv(self.features, self.kernel,
                           padding=[(1, 1), (1, 1)], dtype=x.dtype,
                           name="narrow")(x)

    # NOTE (r05, measured): an im2col-matmul conv1 looked 6x faster in
    # ISOLATION (native conv at 84x148 256->128 measures 5% MFU alone) but
    # in the fused head graph the swap was noise (-0.012 ms in-context) —
    # XLA schedules the native conv acceptably once it is surrounded by
    # the resize/conv2 pipeline.  Keep nn.Conv; trust only in-context A/B.
    head = dpt_mod.DPTHead(fusion_channels=FUSE, head_channels=32,
                           patch_size=14, metric=False)
    subs = {
        "base": {},
        "narrow_convs": {"LanePaddedConv": NoPad},
    }.get(variant, {})
    with patched(**subs):
        params = head.init(jax.random.PRNGKey(0), fused, (GH, GW))
        fn = jax.jit(lambda p, f: head.apply(p, f, (GH, GW)))
        out = fn(params, fused)
        jax.block_until_ready(out)
    return fn, params


def main():
    print(f"# decoder_split: ViT-L grids {GH}x{GW}, fusion {FUSE}, "
          f"dtype {policy.compute_dtype}")
    sync(jnp.zeros((1,)))  # pay the first-d2h tunnel stall

    results = {}
    for v in ("base", "no_residual_convs"):
        fn, p = build_neck(v)
        results[f"neck_{v}"] = timeit(f"neck[{v}]", fn, p, grids, repeats=3)
    nb = results["neck_base"]
    print(f"  fusion residual convs (base - no_residual): "
          f"{nb - results['neck_no_residual_convs']:+.3f} ms "
          f"(FLOP floor of those convs ~0.39 ms)")

    neck_fn, neck_p = build_neck("base")
    fused = neck_fn(neck_p, grids)[-1]
    for v in ("base", "narrow_convs"):
        fn, p = build_head(v, fused)
        results[f"head_{v}"] = timeit(f"head[{v}]", fn, p, fused, repeats=3)

    # head sub-pieces, isolated (same process; relative guide only)
    from desktop2stereo_tpu.ops.resize import resize

    conv1 = nn.Conv(FUSE // 2, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=fused.dtype)
    c1p = conv1.init(jax.random.PRNGKey(1), fused)
    c1 = jax.jit(lambda p, f: conv1.apply(p, f))
    x1 = c1(c1p, fused)
    timeit("head conv1 3x3 256->128 @84x148", c1, c1p, fused, repeats=3)
    up = jax.jit(lambda x: resize(x, (MH, MW), mode="bilinear",
                                  align_corners=True))
    x2 = up(x1)
    timeit("head bilinear x3.5 -> 294x518 @128", up, x1, repeats=3)
    lp = dpt_mod.LanePaddedConv(32, (3, 3))
    lpp = lp.init(jax.random.PRNGKey(2), x2)
    lpf = jax.jit(lambda p, x: lp.apply(p, x))
    lpf(lpp, x2)
    timeit("head conv2 3x3 128->32(pad128) @294x518", lpf, lpp, x2,
           repeats=3)
    return results


if __name__ == "__main__":
    main()
