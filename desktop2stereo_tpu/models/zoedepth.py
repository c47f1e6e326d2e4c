"""ZoeDepth: BEiT backbone + classic DPT relative head + metric-bins head.

Math-parity reimplementation of HF `ZoeDepthForDepthEstimation`
(Intel/zoedepth-nyu, -kitti, -nyu-kitti — reference registry
utils.py:732-817, served via transformers in the reference).  Pipeline:

  BEiT features → DPT neck/fusion (shared ClassicDPTDecoder, which also
  yields the relative depth) → metric head: seed-bin regressor (softplus) →
  4 attractor layers over the fusion pyramid → conditional log-binomial
  softmax over bin centers conditioned on the relative-head features.

The nyu-kitti variant carries TWO bin configurations routed by a patch
transformer + MLP domain classifier; in JAX both branches are computed in
one graph and the result selected by the domain vote (no host round-trip,
unlike the reference's `.item()` branch).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from desktop2stereo_tpu.ops.activations import gelu

from desktop2stereo_tpu.models.init_util import jit_init
import numpy as np

from desktop2stereo_tpu.core.registry import ModelSpec
from desktop2stereo_tpu.models.beit import BeitEncoder
from desktop2stereo_tpu.models.dpt_vit import ClassicDPTDecoder
from desktop2stereo_tpu.ops.resize import resize

# name → (bin_configurations, multi_head)
ZOE_PRESETS = {
    "zoedepth-nyu": ([("nyu", 64, 1e-3, 10.0)], False),
    "zoedepth-kitti": ([("kitti", 64, 1e-3, 80.0)], False),
    "zoedepth-nyu-kitti": ([("nyu", 64, 1e-3, 10.0), ("kitti", 64, 1e-3, 80.0)], True),
}
N_ATTRACTORS = (16, 8, 4, 1)
BIN_EMBEDDING_DIM = 128
BOTTLENECK = 256
NUM_RELATIVE_FEATURES = 32
MAX_TEMP, MIN_TEMP = 50.0, 0.0212


def _inv_attractor(dx: jax.Array, alpha: float = 300.0, gamma: int = 2) -> jax.Array:
    """(HF modeling_zoedepth.py inv_attractor — note it is always called with
    its DEFAULT alpha/gamma, not the config values)"""
    return dx / (1.0 + alpha * dx**gamma)


class Projector(nn.Module):
    out_features: int
    mlp_dim: int = 128

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.relu(nn.Conv(self.mlp_dim, (1, 1), name="conv1", dtype=x.dtype)(x))
        return nn.Conv(self.out_features, (1, 1), name="conv2", dtype=h.dtype)(h)


class SeedBinRegressor(nn.Module):
    """softplus bin-centers variant (the released checkpoints' type)."""

    n_bins: int
    mlp_dim: int = 256

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.relu(nn.Conv(self.mlp_dim, (1, 1), name="conv1", dtype=x.dtype)(x))
        return jax.nn.softplus(nn.Conv(self.n_bins, (1, 1), name="conv2", dtype=h.dtype)(h))


class AttractorUnnormed(nn.Module):
    n_attractors: int
    mlp_dim: int = BIN_EMBEDDING_DIM

    @nn.compact
    def __call__(self, x: jax.Array, prev_bin: jax.Array, prev_emb: Optional[jax.Array]):
        if prev_emb is not None:
            if prev_emb.shape[1:3] != x.shape[1:3]:
                prev_emb = resize(prev_emb, (x.shape[1], x.shape[2]),
                                  mode="bilinear", align_corners=True)
            x = x + prev_emb
        h = nn.relu(nn.Conv(self.mlp_dim, (1, 1), name="conv1", dtype=x.dtype)(x))
        attractors = jax.nn.softplus(
            nn.Conv(self.n_attractors, (1, 1), name="conv2", dtype=h.dtype)(h)
        )
        bc = prev_bin
        if bc.shape[1:3] != x.shape[1:3]:
            bc = resize(bc, (x.shape[1], x.shape[2]), mode="bilinear", align_corners=True)
        # delta = mean_i inv_attractor(a_i - c_j)
        dx = attractors[..., :, None] - bc[..., None, :]
        delta = jnp.mean(_inv_attractor(dx), axis=-2)
        new = bc + delta
        return new, new


class ConditionalLogBinomial(nn.Module):
    """Per-pixel (p, t) MLP + log-binomial softmax over n_bins (HF
    ZoeDepthConditionalLogBinomialSoftmax)."""

    n_bins: int
    in_features: int
    condition_dim: int = BIN_EMBEDDING_DIM
    bottleneck_factor: int = 2

    @nn.compact
    def __call__(self, main: jax.Array, cond: jax.Array) -> jax.Array:
        mid = (self.in_features + self.condition_dim) // self.bottleneck_factor
        h = jnp.concatenate([main, cond], axis=-1)
        h = nn.Conv(mid, (1, 1), name="mlp_conv1", dtype=h.dtype)(h)
        h = gelu(h)
        h = nn.Conv(4, (1, 1), name="mlp_conv2", dtype=h.dtype)(h)
        h = jax.nn.softplus(h)

        p_eps = 1e-4
        p = h[..., :2] + p_eps
        prob = p[..., 0] / (p[..., 0] + p[..., 1])
        t = h[..., 2:] + p_eps
        temp = t[..., 0] / (t[..., 0] + t[..., 1])
        temp = (MAX_TEMP - MIN_TEMP) * temp + MIN_TEMP

        eps = 1e-4
        prob = jnp.clip(prob, eps, 1.0)[..., None]
        one_minus = jnp.clip(1.0 - prob, eps, 1.0)
        k = jnp.arange(self.n_bins, dtype=jnp.float32)
        n_minus_1 = float(self.n_bins - 1)

        def log_binom(n, kk, e=1e-7):
            n = n + e
            kk = kk + e
            return n * jnp.log(n) - kk * jnp.log(kk) - (n - kk) * jnp.log(n - kk + e)

        y = (log_binom(jnp.asarray(n_minus_1), k)
             + k * jnp.log(prob)
             + (n_minus_1 - k) * jnp.log(one_minus))
        return jax.nn.softmax(y / temp[..., None], axis=-1)


class MetricBinsHead(nn.Module):
    """Single-configuration metric head (HF
    ZoeDepthMetricDepthEstimationHead).  Operates NHWC; bins on the last
    axis."""

    n_bins: int

    @nn.compact
    def __call__(self, features, bottleneck, fusion_blocks, relative_depth):
        x = nn.Conv(bottleneck.shape[-1], (1, 1), name="conv2", dtype=bottleneck.dtype)(bottleneck)
        prev_bin = SeedBinRegressor(self.n_bins, name="seed_bin_regressor")(x)
        prev_emb = Projector(BIN_EMBEDDING_DIM, name="seed_projector")(x)

        bin_centers = prev_bin
        emb = prev_emb
        for i, feat in enumerate(fusion_blocks):
            emb = Projector(BIN_EMBEDDING_DIM, name=f"projector_{i}")(feat)
            prev_bin, bin_centers = AttractorUnnormed(
                N_ATTRACTORS[i], name=f"attractor_{i}"
            )(emb, prev_bin, prev_emb)
            prev_emb = emb

        last = features
        rel = resize(relative_depth[..., None], (last.shape[1], last.shape[2]),
                     mode="bilinear", align_corners=True)
        last = jnp.concatenate([last, rel], axis=-1)
        emb_up = resize(emb, (last.shape[1], last.shape[2]),
                        mode="bilinear", align_corners=True)
        probs = ConditionalLogBinomial(
            self.n_bins, NUM_RELATIVE_FEATURES + 1, name="conditional_log_binomial",
        )(last, emb_up)
        centers_up = resize(bin_centers, (probs.shape[1], probs.shape[2]),
                            mode="bilinear", align_corners=True)
        return jnp.sum(probs * centers_up, axis=-1)


class PatchTransformer(nn.Module):
    """Domain classifier trunk (HF ZoeDepthPatchTransformerEncoder):
    1x1 conv embed + cls pad + 1D sin/cos + 4 post-norm encoder layers."""

    hidden_size: int = 128
    num_heads: int = 4
    intermediate: int = 1024
    num_layers: int = 4

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        emb = nn.Conv(self.hidden_size, (1, 1), name="embedding", dtype=x.dtype)(x)
        seq = emb.reshape(B, H * W, self.hidden_size)
        # HF pads a zero CLS slot at the FRONT of the flattened sequence
        seq = jnp.concatenate(
            [jnp.zeros((B, 1, self.hidden_size), seq.dtype), seq], axis=1
        )
        N = seq.shape[1]
        pos = np.arange(N, dtype=np.float64)[:, None]
        idx = np.arange(0, self.hidden_size, 2, dtype=np.float64)[None, :]
        ang = pos * np.exp(idx * (-math.log(10000.0) / self.hidden_size))
        pe = np.concatenate([np.sin(ang), np.cos(ang)], axis=1).astype(np.float32)
        seq = seq + jnp.asarray(pe)[None]

        hd = self.hidden_size // self.num_heads
        for li in range(self.num_layers):
            q = nn.Dense(self.hidden_size, name=f"q_{li}", dtype=seq.dtype)(seq)
            k = nn.Dense(self.hidden_size, name=f"k_{li}", dtype=seq.dtype)(seq)
            v = nn.Dense(self.hidden_size, name=f"v_{li}", dtype=seq.dtype)(seq)

            def heads(t):
                return t.reshape(B, N, self.num_heads, hd).transpose(0, 2, 1, 3)

            logits = (heads(q) @ heads(k).transpose(0, 1, 3, 2)) / math.sqrt(hd)
            attn = jax.nn.softmax(logits, axis=-1) @ heads(v)
            attn = attn.transpose(0, 2, 1, 3).reshape(B, N, self.hidden_size)
            attn = nn.Dense(self.hidden_size, name=f"out_{li}", dtype=attn.dtype)(attn)
            seq = nn.LayerNorm(epsilon=1e-5, name=f"norm1_{li}", dtype=seq.dtype)(seq + attn)
            h = nn.relu(nn.Dense(self.intermediate, name=f"fc1_{li}", dtype=seq.dtype)(seq))
            h = nn.Dense(self.hidden_size, name=f"fc2_{li}", dtype=h.dtype)(h)
            seq = nn.LayerNorm(epsilon=1e-5, name=f"norm2_{li}", dtype=seq.dtype)(seq + h)
        return seq[:, 0]


class MultiMetricBinsHead(nn.Module):
    """Two-configuration head with domain routing (HF
    ZoeDepthMultipleMetricDepthEstimationHeads).  Both branches run in one
    graph; the domain vote selects the output."""

    configs: Tuple[Tuple[str, int, float, float], ...]

    @nn.compact
    def __call__(self, features, bottleneck, fusion_blocks, relative_depth):
        x = nn.Conv(bottleneck.shape[-1], (1, 1), name="conv2", dtype=bottleneck.dtype)(bottleneck)
        cls_emb = PatchTransformer(name="patch_transformer")(x)
        h = nn.relu(nn.Dense(128, name="classifier_fc1", dtype=cls_emb.dtype)(cls_emb))
        domain_logits = nn.Dense(2, name="classifier_fc2", dtype=h.dtype)(h)
        vote = jax.nn.softmax(jnp.sum(domain_logits, axis=0), axis=-1)
        pick = jnp.argmax(vote)

        seed_emb = Projector(BIN_EMBEDDING_DIM, mlp_dim=BIN_EMBEDDING_DIM // 2,
                             name="seed_projector")(x)
        proj_embs = [
            Projector(BIN_EMBEDDING_DIM, mlp_dim=BIN_EMBEDDING_DIM // 2,
                      name=f"projector_{i}")(feat)
            for i, feat in enumerate(fusion_blocks)
        ]

        outs = []
        for name, n_bins, dmin, dmax in self.configs:
            prev_bin = SeedBinRegressor(
                n_bins, mlp_dim=BIN_EMBEDDING_DIM // 2,
                name=f"seed_bin_regressor_{name}",
            )(x)
            prev_emb = seed_emb
            bin_centers = prev_bin
            emb = prev_emb
            for i in range(4):
                emb = proj_embs[i]
                # HF quirk: the multi-head variant passes n_attractors[i] as
                # n_bins and leaves n_attractors at its default 16 for every
                # layer (modeling_zoedepth.py:1022) — replicate for weight
                # compatibility.
                prev_bin, bin_centers = AttractorUnnormed(
                    16, name=f"attractor_{name}_{i}"
                )(emb, prev_bin, prev_emb)
                prev_emb = emb
            emb_up = resize(emb, (features.shape[1], features.shape[2]),
                            mode="bilinear", align_corners=True)
            probs = ConditionalLogBinomial(
                n_bins, NUM_RELATIVE_FEATURES, bottleneck_factor=4,
                name=f"conditional_log_binomial_{name}",
            )(features, emb_up)
            centers_up = resize(bin_centers, (probs.shape[1], probs.shape[2]),
                                mode="bilinear", align_corners=True)
            outs.append(jnp.sum(probs * centers_up, axis=-1))
        depth = jnp.where(pick == 0, outs[0], outs[1])
        return depth


class ZoeDepth(nn.Module):
    """pixels [B,H,W,3] (normalized 0.5/0.5) → metric depth [B,h',w']."""

    preset: str
    neck_channels: Sequence[int]
    fusion_channels: int
    patch_size: int = 16
    quant: bool = False  # int8 trunk matmuls (ops/quant.py), opt-in

    @classmethod
    def from_spec(cls, spec: ModelSpec, quant: bool = False) -> "ZoeDepth":
        return cls(preset=spec.name, neck_channels=spec.neck_channels,
                   fusion_channels=spec.fusion_channels,
                   patch_size=spec.patch_size, quant=quant)

    @nn.compact
    def __call__(self, pixels: jax.Array, biases=None) -> jax.Array:
        from desktop2stereo_tpu.models.beit import BEIT_PRESETS

        configs, multi = ZOE_PRESETS[self.preset]
        hidden, layers, heads, mlp, out_idx, window = BEIT_PRESETS.get(
            self.preset, BEIT_PRESETS["zoedepth"]
        )
        feats, gh, gw = BeitEncoder(
            hidden_size=hidden, num_layers=layers, num_heads=heads, mlp_dim=mlp,
            out_indices=out_idx, pretrain_window=window,
            patch_size=self.patch_size, quant=self.quant, name="backbone",
        )(pixels, biases=biases)
        relative_depth, aux = ClassicDPTDecoder(
            hidden_size=hidden, neck_channels=self.neck_channels,
            fusion_channels=self.fusion_channels,
            head_mid_channels=NUM_RELATIVE_FEATURES, name="decoder",
        )(feats, gh, gw, return_aux=True)

        if multi:
            head = MultiMetricBinsHead(tuple(configs), name="metric_head")
        else:
            head = MetricBinsHead(configs[0][1], name="metric_head")
        # The metric-bins math (attractor deltas, log-binomial softmax) loses
        # its precision below f32, but the BEiT trunk does not: running the
        # trunk at the session compute dtype and promoting only the head
        # halves the frame cost on TPU (12.4 → ~5 ms at bf16 trunk) with the
        # head numerics unchanged.
        f32 = lambda t: t.astype(jnp.float32)
        return head(f32(aux["features"]), f32(aux["bottleneck"]),
                    [f32(f) for f in aux["fusion"]], f32(relative_depth))


def build_zoedepth(spec: ModelSpec, checkpoint=None, param_dtype=jnp.float32,
                   rng_seed: int = 0, init_size: Optional[int] = None,
                   quant: bool = False):
    model = ZoeDepth.from_spec(spec, quant=quant)
    from desktop2stereo_tpu.models.factory import find_checkpoint

    ckpt = checkpoint or find_checkpoint(spec)
    if ckpt is not None:
        from desktop2stereo_tpu.models.convert_hf import convert_zoedepth

        params = {"params": convert_zoedepth(ckpt, spec)}
    else:
        size = init_size or (spec.patch_size * 4)
        float_model = ZoeDepth.from_spec(spec) if quant else model
        params = jit_init(float_model, jnp.zeros((1, size, size, 3), jnp.float32),
                     rng_seed=rng_seed)
        print(f"[models] no checkpoint found for {spec.name}; using random init")
    params = jax.tree.map(lambda p: jnp.asarray(p, param_dtype), params)
    if quant:
        from desktop2stereo_tpu.ops.quant import quantize_tree

        params = quantize_tree(params)

    def apply(p, pixels):
        return model.apply(p, pixels)

    return apply, params, spec


def make_zoe_stream_fns(model: "ZoeDepth", spec: ModelSpec):
    """(first, step) carrying the per-shape BEiT rel-pos biases as model
    state (see beit.make_beit_stream_fns)."""
    from desktop2stereo_tpu.models.beit import make_beit_stream_fns

    return make_beit_stream_fns(model, spec, "zoedepth")
