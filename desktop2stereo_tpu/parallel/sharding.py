"""Multi-chip execution: data-parallel frame batching + tensor-parallel ViT.

The reference is single-GPU; its only "parallelism" is a 3-thread pipeline
(reference main.py:67-68).  The TPU build treats scale as first-class
(SURVEY §2.4 translation): a ("data", "model") mesh where

- the *data* axis shards a batch of concurrent streams (dual-display capture,
  multi-client serving) — batch dim of every activation;
- the *model* axis tensor-parallels the ViT (Megatron-style): qkv/fc1 split
  on the output feature dim, proj/fc2 on the input dim, so each block does
  one all-reduce pair, inserted automatically by GSPMD from these
  NamedShardings — no hand-written collectives on the XLA path.
"""

from __future__ import annotations

import contextvars
from contextlib import contextmanager
from dataclasses import dataclass
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from desktop2stereo_tpu.core.runtime import DATA_AXIS, MODEL_AXIS


@dataclass(frozen=True)
class ParallelContext:
    """Trace-time description of the active multi-chip configuration.

    Installed (via a contextvar, so concurrent traces from ProgramCache's
    HTTP/key threads cannot race each other) for the duration of a
    `parallel_frame_apply` trace.  Encoder building blocks consult it:

    - `token_constraint` pins the residual stream token-sharded (SP),
    - attention dispatch keeps the Pallas flash kernel alive by running it
      per-shard under `jax.shard_map` over TP-sharded heads,
    - QuantDense does the same for the fused int8 kernel over its
      Megatron-role-sharded weights.
    """

    mesh: Mesh
    sequence_parallel: bool = False

    @property
    def dp(self) -> int:
        return self.mesh.shape[DATA_AXIS]

    @property
    def tp(self) -> int:
        return self.mesh.shape[MODEL_AXIS]

    @property
    def token_sharding(self) -> Optional[NamedSharding]:
        if not (self.sequence_parallel and self.tp > 1):
            return None
        return NamedSharding(self.mesh, P(DATA_AXIS, MODEL_AXIS))


_PARALLEL_CTX: contextvars.ContextVar[Optional[ParallelContext]] = (
    contextvars.ContextVar("d2s_parallel_ctx", default=None)
)


def current_context() -> Optional[ParallelContext]:
    """The ParallelContext of the trace in progress on THIS thread, if any."""
    return _PARALLEL_CTX.get()


@contextmanager
def parallel_trace(ctx: ParallelContext):
    token = _PARALLEL_CTX.set(ctx)
    try:
        yield ctx
    finally:
        _PARALLEL_CTX.reset(token)


def token_constraint(x: jax.Array) -> jax.Array:
    """Encoder blocks call this on their residual-stream input [B,N,D]; a
    no-op unless a sequence-parallel `parallel_frame_apply` is tracing on
    this thread.  Under SP, GSPMD turns each block's TP all-reduce pair
    into reduce-scatter + all-gather and computes LayerNorm/residual adds
    on 1/model_axis of the tokens per chip — the standard Megatron-SP
    communication pattern ("How to Scale Your Model")."""
    ctx = current_context()
    sharding = ctx.token_sharding if ctx is not None else None
    if sharding is None:
        return x
    return jax.lax.with_sharding_constraint(x, sharding)


# ViT-trunk subtree names across every family (DA/DA3/VDA/BEiT/ZoeDepth/
# InfiniDepth use "backbone"; DepthPro's two towers are patch_encoder /
# image_encoder).  TP rules apply only INSIDE these scopes: decoder and
# head Denses reuse names like proj/fc1 with replicated neighbors, where
# sharding one matmul would buy a per-frame all-gather for nothing.
ENCODER_SCOPES = frozenset({"backbone", "patch_encoder", "image_encoder"})


def _parent_role(parent: str) -> "str | None":
    """Megatron role of an ENCODER Dense by its module name, across every
    family: column-parallel (shard output features) for qkv/q/k/v and the
    first MLP matmul (DA fc1/weights_in, DA3 w12, InfiniDepth w1/w2,
    BEiT query/key/value+fc1), row-parallel (shard input features) for
    proj and the second MLP matmul.  Anything else replicates.  GSPMD
    guarantees correctness for ANY spec — these choices only steer the
    collectives to one all-reduce pair per block."""
    if parent in ("w1", "w2"):
        return "col"
    if parent.startswith(("qkv", "query", "key", "value", "fc1",
                          "weights_in", "w12")):
        return "col"
    # "proj" must be EXACT: VDA's temporal proj_in/proj_out are module
    # entry/exit projections whose neighbors are replicated — row-sharding
    # them would insert collectives with nothing sharded in between
    if parent == "proj" or parent == "w3" \
            or parent.startswith(("fc2", "weights_out")):
        return "row"
    return None


# Public alias: QuantDense looks up its own Megatron role by module name to
# pick the shard_map decomposition for its fused kernel (ops/quant.py).
megatron_role = _parent_role


def _tp_spec_for(path: str, shape: Tuple[int, ...],
                 parent: "str | None" = None) -> P:
    """TP rule for a param leaf.  `parent` is the leaf's module name; when
    absent it is recovered from the bracketed keystr path, and the rule
    only fires for leaves inside an encoder scope (see ENCODER_SCOPES)."""
    if parent is None:
        import re

        names = re.findall(r"\['([^']+)'\]", path)
        parent = names[-2] if len(names) >= 2 else ""
        if not any(n in ENCODER_SCOPES for n in names):
            return P()
    role = _parent_role(parent)
    if role == "col":
        return P(None, MODEL_AXIS) if len(shape) == 2 else P(MODEL_AXIS)
    if role == "row" and len(shape) == 2:
        return P(MODEL_AXIS, None)
    # convs, norms, embeddings, biases of row-parallel matmuls: replicated
    return P()


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place a param tree on the mesh with TP shardings (replicated if the
    mesh has no model axis extent)."""
    tp = mesh.shape[MODEL_AXIS] > 1

    def place(path, leaf):
        pathstr = jax.tree_util.keystr(path)
        spec = _tp_spec_for(pathstr, leaf.shape) if tp else P()
        # divisibility guard: fall back to replication if the dim doesn't split
        if tp and any(
            ax is not None and leaf.shape[i] % mesh.shape[ax] != 0
            for i, ax in enumerate(spec)
        ):
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def parallel_frame_apply(
    model_apply: Callable,
    mesh: Mesh,
    sequence_parallel: bool = False,
) -> Callable:
    """Wraps `model_apply(params, pixels)` for a data-sharded frame batch.

    pixels [B,H,W,3] is sharded on B over the data axis; params carry their
    own (TP or replicated) shardings; the output depth [B,h,w] stays
    data-sharded.  GSPMD inserts the TP all-reduces over ICI.

    `sequence_parallel=True` additionally shards the encoder's residual
    stream on the TOKEN dim over the model axis (see token_constraint):
    LayerNorms/residual adds run on N/model_axis tokens per chip and the TP
    all-reduce pair becomes reduce-scatter + all-gather — worthwhile for
    giant encoders at 4K token counts where full-N activations dominate
    VMEM/HBM traffic.
    """
    data_in = NamedSharding(mesh, P(DATA_AXIS))
    out_sharding = NamedSharding(mesh, P(DATA_AXIS))
    ctx = ParallelContext(mesh, sequence_parallel=sequence_parallel)

    @jax.jit
    def run(params, pixels):
        # Trace-time: install the ParallelContext so encoder building
        # blocks re-route their Pallas kernels through per-shard shard_map
        # calls (a bare pallas_call is an opaque custom call to GSPMD —
        # over TP-sharded weights its operands would get gathered/
        # replicated per layer, defeating the sharding).  Contextvar scoped
        # to this thread's trace: concurrent traces cannot see it.
        with parallel_trace(ctx):
            pixels = jax.lax.with_sharding_constraint(pixels, data_in)
            depth = model_apply(params, pixels)
        return jax.lax.with_sharding_constraint(depth, out_sharding)

    return run
