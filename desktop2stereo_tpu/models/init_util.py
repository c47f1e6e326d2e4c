"""Shared flax-init helper for the model factories."""

from __future__ import annotations

import jax


def jit_init(model, *init_args, rng_seed: int = 0):
    """Run `model.init` under one jit.

    Eager flax init dispatches every op through the device runtime
    individually — minutes for a ViT on a remote-tunneled TPU (267 s
    measured for VDA-Small) — while jitted it is one compile + one run.
    Used only on the no-checkpoint path; converted weights skip init.
    """
    fn = jax.jit(lambda rng: model.init(rng, *init_args))
    return fn(jax.random.PRNGKey(rng_seed))
