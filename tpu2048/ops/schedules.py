"""LR schedules matching transformers.get_scheduler("cosine").

The reference builds two cosine-with-warmup schedulers (one per optimizer,
train.py:1598-1610) and ticks them ONCE per train step — not per minibatch
(train.py:625) — so every minibatch inside train step t uses multiplier(t).
"""

from __future__ import annotations

import jax.numpy as jnp


def cosine_with_warmup(step, warmup_steps: int, total_steps: int,
                       num_cycles: float = 0.5):
    """transformers cosine_schedule_with_warmup lambda: linear 0->1 over
    warmup, then 0.5*(1+cos(pi * 2*num_cycles * progress)) down to 0."""
    step = jnp.asarray(step, jnp.float32)
    warm = step / jnp.maximum(1.0, warmup_steps)
    progress = (step - warmup_steps) / jnp.maximum(1.0, total_steps - warmup_steps)
    cos = jnp.maximum(
        0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * num_cycles * 2.0 * progress))
    )
    return jnp.where(step < warmup_steps, warm, cos)
