"""Where do the ENCODER's non-matmul milliseconds go?  (VERDICT r04 weak 5)

PERFORMANCE.md attributed ~3.5 ms of the ViT-L encoder's 5.15 ms to a
"softmax VPU floor (~230 M exp/frame)"; the judge's arithmetic says 230 M
transcendentals is a few tenths of a ms on a v5e VPU, so most of that time
must be something else (unfused LN/GELU/residual traffic, layout ops, or
the attention batched-matmul shape).  This bench replaces the guess with
measurements:

1. **Variant deltas, one process, back-to-back** (the only trustworthy
   methodology on the tunnel — CLAUDE.md): re-trace the SAME 24-layer
   encoder with one component stubbed out at trace time and difference the
   slopes.  base − no_softmax = the real softmax cost; base − attn_scores_only
   = softmax + PV matmul; etc.
2. **Isolated ceilings**: a bare jit'd softmax / exp / LayerNorm / GELU at
   the encoder's exact shapes gives each op's standalone rate, and the
   matmul-only variant gives the MXU floor the fused path must approach.
3. **Op-count arithmetic** printed alongside, so the table is auditable
   against hardware rates (v5e: ~197 bf16 TFLOP/s MXU, ~1e12 elem-op/s
   VPU per the pallas guide, ~819 GB/s HBM).

Reference hot loop this optimizes: /root/reference/depth.py:1966.
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
from desktop2stereo_tpu.models import dinov2 as dv
from desktop2stereo_tpu.ops import attention as attn_mod

try:
    from benchmarks._timing import slope_ms, timeit
except ImportError:
    from _timing import slope_ms, timeit

MH, MW = 294, 518            # flagship model input (BASELINE geometry)
spec = get_spec("Depth-Anything-V2-Large")
HID, LAYERS, HEADS, MLP = spec.dims
N = (MH // 14) * (MW // 14) + 1     # tokens incl cls = 778
HD = HID // HEADS

rng = np.random.default_rng(0)
pixels = jnp.asarray(rng.standard_normal((1, MH, MW, 3)), policy.compute_dtype)


def encoder():
    return dv.Dinov2Encoder(
        hidden_size=HID, num_layers=LAYERS, num_heads=HEADS, mlp_dim=MLP,
        out_layers=tuple(spec.dpt_layers), patch_size=spec.patch_size)


@contextlib.contextmanager
def patched(**subs):
    """Swap module-level callables during TRACE time only (jit traces once;
    the compiled program keeps the substitution, the modules get restored)."""
    saved = {}
    for dotted, repl in subs.items():
        mod_name, attr = dotted.rsplit(".", 1)
        mod = {"dv": dv, "attn": attn_mod, "jnn": jax.nn, "nn": nn}[mod_name]
        saved[dotted] = getattr(mod, attr)
        setattr(mod, attr, repl)
    try:
        yield
    finally:
        for dotted, orig in saved.items():
            mod_name, attr = dotted.rsplit(".", 1)
            mod = {"dv": dv, "attn": attn_mod, "jnn": jax.nn, "nn": nn}[mod_name]
            setattr(mod, attr, orig)


def build(variant: str):
    """Returns (jitted_fn, params) for an encoder with `variant` stubbed."""
    def softmax_free(q, k, v, use_flash=None, bias=None):
        # both attention matmuls, NO softmax: probs = scaled logits
        B, n, H, D = q.shape
        logits = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                            preferred_element_type=jnp.float32) * (1.0 / D)
        return jnp.einsum("bhnm,bmhd->bnhd", logits.astype(q.dtype), v,
                          preferred_element_type=q.dtype)

    def attn_free(q, k, v, use_flash=None, bias=None):
        return v  # no QK^T, no softmax, no PV: isolates qkv/proj matmuls

    # NOTE: since r05 the models route GELU through ops/activations.gelu
    # (tanh on bf16) — imported into dinov2's namespace as `dv.gelu`, which
    # is what these variants must patch.  On the bf16 TPU path "base" IS
    # the tanh form; gelu_erf re-measures the pre-r05 exact-erf cost.
    def gelu_free(x):
        return x

    def gelu_erf(x):
        return jax.nn.gelu(x, approximate=False)

    def gelu_sigmoid(x):
        return x * jax.nn.sigmoid(1.702 * x)

    class LNFree(nn.Module):
        epsilon: float = 1e-6
        dtype: object = None

        @nn.compact
        def __call__(self, x):
            scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
            bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
            return x * scale.astype(x.dtype) + bias.astype(x.dtype)

    subs = {
        "base": {},
        "flash": {},  # FORCE_FLASH handled below
        "no_softmax": {"dv.multi_head_attention": softmax_free},
        "no_attention": {"dv.multi_head_attention": attn_free},
        "no_gelu": {"dv.gelu": gelu_free},
        "gelu_erf": {"dv.gelu": gelu_erf},
        "gelu_sigmoid": {"dv.gelu": gelu_sigmoid},
        "no_layernorm": {"nn.LayerNorm": LNFree},
    }[variant]

    prev_flash = attn_mod.FORCE_FLASH
    if variant == "flash":
        attn_mod.FORCE_FLASH = True
    try:
        with patched(**subs):
            enc = encoder()
            params = enc.apply, enc.init(jax.random.PRNGKey(0),
                                         jnp.zeros((1, 126, 126, 3),
                                                   policy.compute_dtype))
            fn = jax.jit(lambda p, px: enc.apply(p, px))
            out = fn(params[1], pixels)           # trace+compile INSIDE patch
            jax.block_until_ready(out)
    finally:
        attn_mod.FORCE_FLASH = prev_flash
    return fn, params[1]


def main():
    print(f"# encoder_split: ViT-L {MH}x{MW} -> N={N}, hidden {HID}, "
          f"{LAYERS} layers, {HEADS} heads, mlp {MLP}, "
          f"dtype {policy.compute_dtype}")

    # ---- op-count arithmetic (the auditable floor table) ----
    L, H_, n = LAYERS, HEADS, N
    dense_flops = L * 2 * n * HID * (3 * HID + HID + 2 * MLP)
    attn_flops = L * H_ * 4 * n * n * HD
    exps = L * H_ * n * n
    ln_elems = (2 * L + 1) * n * HID
    gelu_elems = L * n * MLP
    resid_elems = 2 * L * n * HID
    logits_bytes = L * H_ * n * n * 4
    print(f"  dense matmul FLOPs/frame: {dense_flops/1e9:.1f} G "
          f"(MXU floor @197T: {dense_flops/197e12*1e3:.2f} ms)")
    print(f"  attention matmul FLOPs:   {attn_flops/1e9:.1f} G "
          f"(hd=64 => <=50% MXU lanes)")
    print(f"  exp() count: {exps/1e6:.0f} M  "
          f"(VPU floor @1e12 elem-op/s, ~5 ops/softmax-elem: "
          f"{exps*5/1e12*1e3:.2f} ms)")
    print(f"  LN {ln_elems/1e6:.0f} M elems, GELU {gelu_elems/1e6:.0f} M, "
          f"residual+LS {resid_elems/1e6:.0f} M")
    print(f"  logits f32 HBM if materialized 3x: "
          f"{3*logits_bytes/1e9:.2f} GB => {3*logits_bytes/819e9*1e3:.2f} ms")

    # throwaway first d2h (25-200 s tunnel stall) before ANY timed region
    from benchmarks._timing import sync
    sync(jnp.zeros((1,)))

    # ---- isolated op ceilings at exact shapes ----
    logits = jnp.asarray(rng.standard_normal((H_, n, n)), jnp.float32)
    hid = jnp.asarray(rng.standard_normal((n, HID)), policy.compute_dtype)
    mlp_act = jnp.asarray(rng.standard_normal((n, MLP)), policy.compute_dtype)
    sm = jax.jit(lambda x: jax.nn.softmax(x, axis=-1))
    ex = jax.jit(lambda x: jnp.exp(x))
    ln = jax.jit(lambda x: nn.LayerNorm(use_bias=False, use_scale=False)
                 .apply({}, x))
    ge = jax.jit(lambda x: jax.nn.gelu(x, approximate=False))
    t_sm = timeit(f"softmax [{H_},{n},{n}] f32 (x{L})", sm, logits)
    t_ex = timeit(f"exp     [{H_},{n},{n}] f32 (x{L})", ex, logits)
    t_ln = timeit(f"layernorm [{n},{HID}] (x{2*L+1})", ln, hid)
    t_ge = timeit(f"gelu    [{n},{MLP}] (x{L})", ge, mlp_act)
    print(f"  => per-frame isolated: softmax {t_sm*L:.2f} ms, "
          f"exp {t_ex*L:.2f}, LN {t_ln*(2*L+1):.2f}, GELU {t_ge*L:.2f}")

    # ---- encoder variant deltas (one process, back-to-back) ----
    results = {}
    for variant in ("base", "no_softmax", "no_attention", "no_gelu",
                    "gelu_erf", "gelu_sigmoid", "no_layernorm", "flash"):
        fn, params = build(variant)
        results[variant] = timeit(f"encoder[{variant}]", fn, params, pixels,
                                  repeats=3)
    b = results["base"]
    print(f"\n  softmax cost   (base - no_softmax):   "
          f"{b - results['no_softmax']:+.3f} ms")
    print(f"  attn core cost (base - no_attention): "
          f"{b - results['no_attention']:+.3f} ms")
    print(f"  gelu cost      (base - no_gelu):      "
          f"{b - results['no_gelu']:+.3f} ms  (base = production path: "
          f"tanh on bf16)")
    print(f"  exact-erf gelu costs vs base:         "
          f"{results['gelu_erf'] - b:+.3f} ms  (the pre-r05 form)")
    print(f"  sigmoid gelu vs base:                 "
          f"{results['gelu_sigmoid'] - b:+.3f} ms")
    print(f"  layernorm cost (base - no_layernorm): "
          f"{b - results['no_layernorm']:+.3f} ms")
    print(f"  flash vs base:                        "
          f"{results['flash'] - b:+.3f} ms")
    return results


if __name__ == "__main__":
    main()
