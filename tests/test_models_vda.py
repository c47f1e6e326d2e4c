"""Video-Depth-Anything tests.

1. Exact parity of the temporal module (GroupNorm → proj_in → 2×(LN →
   time-attention) → GEGLU FF → proj_out, reference motion_module.py:32-190)
   against a torch replica built here from the published AnimateDiff design,
   in both batch (clip) and streaming (rolling cache) modes.
2. Converter structure: a synthesized state dict with the original VDA
   naming must convert to a tree identical to a fresh flax init.
3. Streaming semantics of the full model: cache rolls, shapes, finiteness.
"""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from desktop2stereo_tpu.core.registry import ModelSpec
from desktop2stereo_tpu.models import vda as vda_mod
from desktop2stereo_tpu.models.vda import (
    CACHE_LEN,
    TemporalTransformer,
    VideoDepthAnything,
    make_vda_fns,
)
from desktop2stereo_tpu.models.convert_hf import (
    _convert_temporal_module,
    convert_vda,
    param_count,
)


# ---------------------------------------------------------------------------
# Torch replica of the temporal module (test fixture, not framework code)
# ---------------------------------------------------------------------------

def build_torch_temporal(torch, C, heads):
    nn = torch.nn

    class TTAttention(nn.Module):
        def __init__(self):
            super().__init__()
            self.to_q = nn.Linear(C, C, bias=False)
            self.to_k = nn.Linear(C, C, bias=False)
            self.to_v = nn.Linear(C, C, bias=False)
            self.to_out = nn.ModuleList([nn.Linear(C, C), nn.Dropout(0.0)])
            pos = torch.arange(32).unsqueeze(1).double()
            div = torch.exp(torch.arange(0, C, 2).double() * (-math.log(10000.0) / C))
            pe = torch.zeros(1, 32, C)
            pe[0, :, 0::2] = torch.sin(pos * div).float()
            pe[0, :, 1::2] = torch.cos(pos * div).float()
            self.register_buffer("pe", pe)

        def forward(self, x, cache=None):
            # x [R, f, C]; cache [R, n, C] or None
            entry = x
            full = torch.cat([cache, x], dim=1) if cache is not None else x
            n = full.shape[1]
            f = x.shape[1]
            full = full + self.pe[:, :n]
            q = self.to_q(full[:, n - f:])
            k = self.to_k(full)
            v = self.to_v(full)
            R = q.shape[0]
            hd = C // heads

            def split(t):
                return t.reshape(R, -1, heads, hd).permute(0, 2, 1, 3)

            attn = torch.softmax(
                split(q) @ split(k).transpose(-1, -2) / math.sqrt(hd), dim=-1
            )
            out = (attn @ split(v)).permute(0, 2, 1, 3).reshape(R, f, C)
            return self.to_out[0](out), entry

    class GEGLUFF(nn.Module):
        def __init__(self):
            super().__init__()
            proj = nn.Linear(C, 8 * C)
            out = nn.Linear(4 * C, C)
            act = nn.Module()
            act.proj = proj
            self.net = nn.ModuleList([act, nn.Dropout(0.0), out])

        def forward(self, x):
            h = self.net[0].proj(x)
            val, gate = h.chunk(2, dim=-1)
            return self.net[2](val * torch.nn.functional.gelu(gate))

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.attention_blocks = nn.ModuleList([TTAttention(), TTAttention()])
            self.norms = nn.ModuleList([nn.LayerNorm(C), nn.LayerNorm(C)])
            self.ff = GEGLUFF()
            self.ff_norm = nn.LayerNorm(C)

        def forward(self, x, caches=None):
            entries = []
            for i in range(2):
                out, entry = self.attention_blocks[i](
                    self.norms[i](x), caches[i] if caches else None
                )
                x = x + out
                entries.append(entry)
            x = x + self.ff(self.ff_norm(x))
            return x, entries

    class Inner(nn.Module):
        def __init__(self):
            super().__init__()
            self.norm = nn.GroupNorm(32, C, eps=1e-6)
            self.proj_in = nn.Linear(C, C)
            self.transformer_blocks = nn.ModuleList([Block()])
            self.proj_out = nn.Linear(C, C)

        def forward(self, x, caches=None):
            # x [B, C, T, H, W] (reference layout); caches per attn [R, n, C]
            B, C_, T, H, W = x.shape
            flat = x.permute(0, 2, 1, 3, 4).reshape(B * T, C_, H, W)
            residual = flat
            h = self.norm(flat)
            h = h.permute(0, 2, 3, 1).reshape(B * T, H * W, C_)
            h = self.proj_in(h)
            # [(B·T), HW, C] → [(B·HW), T, C]
            h = h.reshape(B, T, H * W, C_).permute(0, 2, 1, 3).reshape(B * H * W, T, C_)
            h, entries = self.transformer_blocks[0](h, caches)
            h = self.proj_out(h)
            h = h.reshape(B, H * W, T, C_).permute(0, 2, 1, 3).reshape(B * T, H * W, C_)
            h = h.reshape(B * T, H, W, C_).permute(0, 3, 1, 2)
            out = (h + residual).reshape(B, T, C_, H, W).permute(0, 2, 1, 3, 4)
            return out, entries

    class Container(nn.Module):
        def __init__(self):
            super().__init__()
            self.temporal_transformer = Inner()

        def forward(self, x, caches=None):
            return self.temporal_transformer(x, caches)

    return Container()


def _flax_params_from_torch(tmod):
    sd = {k: v.detach().numpy() for k, v in tmod.state_dict().items()}
    return _convert_temporal_module(sd, "")


C, HEADS = 64, 8
B, T, H, W = 1, 3, 2, 3


def _run_flax_temporal(params, x_bthwc, caches=None):
    mod = TemporalTransformer(C)
    variables = {"params": params}
    return mod.apply(variables, jnp.asarray(x_bthwc), caches)


def test_temporal_module_batch_parity(torch):
    tmod = build_torch_temporal(torch, C, HEADS)
    params = _flax_params_from_torch(tmod)

    rng = np.random.default_rng(3)
    x = rng.standard_normal((B, T, H, W, C)).astype(np.float32)
    with torch.no_grad():
        ref, ref_entries = tmod(torch.from_numpy(x).permute(0, 4, 1, 2, 3))
    ref = ref.permute(0, 2, 3, 4, 1).numpy()

    out, entries = _run_flax_temporal(params, x)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)
    # cache entries match too ([B,HW,T,C] vs torch [(B·HW),T,C])
    for e, re_ in zip(entries, ref_entries):
        np.testing.assert_allclose(
            np.asarray(e).reshape(B * H * W, T, C), re_.numpy(), atol=2e-5, rtol=1e-4
        )


def test_temporal_module_streaming_parity(torch):
    """Streaming step with a random rolling cache must match torch exactly."""
    tmod = build_torch_temporal(torch, C, HEADS)
    params = _flax_params_from_torch(tmod)

    rng = np.random.default_rng(5)
    n = 7  # arbitrary window length
    x = rng.standard_normal((B, 1, H, W, C)).astype(np.float32)
    caches_np = [
        rng.standard_normal((B * H * W, n, C)).astype(np.float32) for _ in range(2)
    ]
    with torch.no_grad():
        ref, _ = tmod(
            torch.from_numpy(x).permute(0, 4, 1, 2, 3),
            [torch.from_numpy(c) for c in caches_np],
        )
    ref = ref.permute(0, 2, 3, 4, 1).numpy()

    caches_j = tuple(jnp.asarray(c).reshape(B, H * W, n, C) for c in caches_np)
    out, entries = _run_flax_temporal(params, x, caches_j)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)
    assert entries[0].shape == (B, H * W, 1, C)


# ---------------------------------------------------------------------------
# Full-model: converter structure + streaming semantics
# ---------------------------------------------------------------------------

TINY_SPEC = ModelSpec(name="vda-test", family="vda", variant="vits", hf_repo="none")


def tiny_vda():
    # vits dims but fewer layers would break dpt_layers; use real vits config
    # at a tiny input (42x42 → 3x3 grid) to keep it fast.
    return VideoDepthAnything.from_spec(TINY_SPEC)


def synth_state_dict(rng):
    """Random state dict with the ORIGINAL VDA naming (pretrained.* + head.*)
    for the vits config: hidden 384, 12 layers, neck (48,96,192,384),
    fusion 64."""
    hidden, layers = 384, 12
    neck = (48, 96, 192, 384)
    fusion = 64
    sd = {}

    def add(name, *shape):
        sd[name] = rng.standard_normal(shape).astype(np.float32) * 0.02

    add("pretrained.cls_token", 1, 1, hidden)
    add("pretrained.pos_embed", 1, 37 * 37 + 1, hidden)
    add("pretrained.patch_embed.proj.weight", hidden, 3, 14, 14)
    add("pretrained.patch_embed.proj.bias", hidden)
    add("pretrained.norm.weight", hidden)
    add("pretrained.norm.bias", hidden)
    for i in range(layers):
        p = f"pretrained.blocks.{i}."
        add(p + "norm1.weight", hidden)
        add(p + "norm1.bias", hidden)
        add(p + "norm2.weight", hidden)
        add(p + "norm2.bias", hidden)
        add(p + "attn.qkv.weight", 3 * hidden, hidden)
        add(p + "attn.qkv.bias", 3 * hidden)
        add(p + "attn.proj.weight", hidden, hidden)
        add(p + "attn.proj.bias", hidden)
        add(p + "ls1.gamma", hidden)
        add(p + "ls2.gamma", hidden)
        add(p + "mlp.fc1.weight", 4 * hidden, hidden)
        add(p + "mlp.fc1.bias", 4 * hidden)
        add(p + "mlp.fc2.weight", hidden, 4 * hidden)
        add(p + "mlp.fc2.bias", hidden)

    for i, ch in enumerate(neck):
        add(f"head.projects.{i}.weight", ch, hidden, 1, 1)
        add(f"head.projects.{i}.bias", ch)
        add(f"head.scratch.layer{i+1}_rn.weight", fusion, ch, 3, 3)
    add("head.resize_layers.0.weight", neck[0], neck[0], 4, 4)
    add("head.resize_layers.0.bias", neck[0])
    add("head.resize_layers.1.weight", neck[1], neck[1], 2, 2)
    add("head.resize_layers.1.bias", neck[1])
    add("head.resize_layers.3.weight", neck[3], neck[3], 3, 3)
    add("head.resize_layers.3.bias", neck[3])

    for rn in (1, 2, 3, 4):
        p = f"head.scratch.refinenet{rn}."
        add(p + "out_conv.weight", fusion, fusion, 1, 1)
        add(p + "out_conv.bias", fusion)
        for unit in (1, 2):
            for conv in (1, 2):
                add(p + f"resConfUnit{unit}.conv{conv}.weight", fusion, fusion, 3, 3)
                add(p + f"resConfUnit{unit}.conv{conv}.bias", fusion)

    temporal_dims = (neck[2], neck[3], fusion, fusion)
    for m, Cm in enumerate(temporal_dims):
        p = f"head.motion_modules.{m}.temporal_transformer."
        add(p + "norm.weight", Cm)
        add(p + "norm.bias", Cm)
        add(p + "proj_in.weight", Cm, Cm)
        add(p + "proj_in.bias", Cm)
        add(p + "proj_out.weight", Cm, Cm)
        add(p + "proj_out.bias", Cm)
        bp = p + "transformer_blocks.0."
        for a in range(2):
            ap = bp + f"attention_blocks.{a}."
            add(ap + "to_q.weight", Cm, Cm)
            add(ap + "to_k.weight", Cm, Cm)
            add(ap + "to_v.weight", Cm, Cm)
            add(ap + "to_out.0.weight", Cm, Cm)
            add(ap + "to_out.0.bias", Cm)
            add(bp + f"norms.{a}.weight", Cm)
            add(bp + f"norms.{a}.bias", Cm)
        add(bp + "ff_norm.weight", Cm)
        add(bp + "ff_norm.bias", Cm)
        add(bp + "ff.net.0.proj.weight", 8 * Cm, Cm)
        add(bp + "ff.net.0.proj.bias", 8 * Cm)
        add(bp + "ff.net.2.weight", Cm, 4 * Cm)
        add(bp + "ff.net.2.bias", Cm)

    add("head.scratch.output_conv1.weight", fusion // 2, fusion, 3, 3)
    add("head.scratch.output_conv1.bias", fusion // 2)
    add("head.scratch.output_conv2.0.weight", 32, fusion // 2, 3, 3)
    add("head.scratch.output_conv2.0.bias", 32)
    add("head.scratch.output_conv2.2.weight", 1, 32, 1, 1)
    add("head.scratch.output_conv2.2.bias", 1)
    return sd


@pytest.mark.slow
def test_vda_converter_tree_matches_init():
    rng = np.random.default_rng(11)
    sd = synth_state_dict(rng)
    conv = convert_vda(sd, TINY_SPEC)

    model = tiny_vda()
    init = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 42, 42, 3), jnp.float32), 1, None
    )["params"]

    conv_paths = {jax.tree_util.keystr(k): tuple(np.shape(v))
                  for k, v in jax.tree.leaves_with_path(conv)}
    init_paths = {jax.tree_util.keystr(k): tuple(v.shape)
                  for k, v in jax.tree.leaves_with_path(init)}
    assert set(conv_paths) == set(init_paths), sorted(
        set(conv_paths) ^ set(init_paths))[:10]
    for k in conv_paths:
        assert conv_paths[k] == init_paths[k], (k, conv_paths[k], init_paths[k])
    assert param_count(conv) == param_count(init)


@pytest.mark.slow
def test_vda_full_streaming_parity_vs_reference(torch):
    """End-to-end: the reference VideoDepthAnything (random weights, vits,
    56x56) streamed over 3 frames must match our flax streaming path after
    convert_vda — validates the original-dinov2 converter (offset pos
    interp), the temporal head wiring, and the rolling-cache semantics."""
    from tests.reference_loader import load_reference_vda

    RefVDA = load_reference_vda()
    # the reference force-autocasts its final head convs (dpt_temporal.py:117
    # maybe_autocast always-on) → bf16 on CPU; disable for exact comparison
    import contextlib
    import models.video_depth_anything.dpt_temporal as ref_dpt_temporal

    orig_autocast = ref_dpt_temporal.maybe_autocast
    ref_dpt_temporal.maybe_autocast = lambda *a, **k: contextlib.nullcontext()
    torch.manual_seed(0)
    ref = RefVDA(encoder="vits", features=64, out_channels=[48, 96, 192, 384],
                 num_frames=32)
    ref.eval()

    params = {"params": convert_vda(ref.state_dict(), TINY_SPEC)}
    model = tiny_vda()
    _, first, step = make_vda_fns(model)

    rng = np.random.default_rng(9)
    frames = [rng.standard_normal((56, 56, 3)).astype(np.float32) for _ in range(3)]

    state = None
    for i, f in enumerate(frames):
        with torch.no_grad():
            ref_d = ref(torch.from_numpy(f).permute(2, 0, 1).unsqueeze(0), fp32=True)
        ref_np = ref_d[0, 0].numpy() if ref_d.dim() == 4 else ref_d[0].numpy()

        x = jnp.asarray(f)[None]
        if state is None:
            d, state = first(params, x)
        else:
            d, state = step(params, x, state)
        got = np.asarray(d[0])
        scale = max(np.abs(ref_np).max(), 1e-6)
        rel = np.abs(got - ref_np).max() / scale
        assert rel < 1e-3, f"frame {i}: rel err {rel:.2e}"
    ref_dpt_temporal.maybe_autocast = orig_autocast


@pytest.mark.slow
def test_vda_streaming_rolls_cache():
    model = tiny_vda()
    x0 = jnp.asarray(np.random.default_rng(0).standard_normal((1, 42, 42, 3)),
                     jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0, 1, None)
    apply, first, step = make_vda_fns(model)

    d0, state = first(params, x0)
    assert d0.shape == (1, 42, 42)
    assert len(state.caches) == 8
    for c in state.caches:
        assert c.shape[2] == CACHE_LEN
        # first frame replicates its entry across the window
        np.testing.assert_array_equal(np.asarray(c[:, :, 0]), np.asarray(c[:, :, -1]))

    x1 = jnp.asarray(np.random.default_rng(1).standard_normal((1, 42, 42, 3)),
                     jnp.float32)
    d1, state1 = step(params, x1, state)
    assert d1.shape == (1, 42, 42)
    assert np.isfinite(np.asarray(d1)).all()
    for c0, c1 in zip(state.caches, state1.caches):
        # shift-left: new cache[: -1] == old cache[1:]
        np.testing.assert_array_equal(np.asarray(c1[:, :, :-1]), np.asarray(c0[:, :, 1:]))
        # and the appended entry differs from the old tail
        assert not np.allclose(np.asarray(c1[:, :, -1]), np.asarray(c0[:, :, -1]))

    # clip mode runs too (T folded as batch)
    clip = jnp.concatenate([x0, x1], axis=0)
    dclip = apply(params, clip)
    assert dclip.shape == (2, 42, 42)


def test_vda_batch_mode_rejects_clips_beyond_window():
    """Batch mode caps clips at INFER_LEN=32 (the APE table / temporal
    window length, reference motion_module.py:190-208); longer clips get a
    clear error pointing at the streaming path, not a broadcast crash."""
    from desktop2stereo_tpu.models.vda import INFER_LEN

    apply, _, _ = make_vda_fns(tiny_vda())
    clip = jnp.zeros((INFER_LEN + 1, 28, 28, 3), jnp.float32)
    with pytest.raises(ValueError, match="streaming"):
        apply(None, clip)
