"""Tiny TPU canary: one small jit + fetch, exits 0 on success.

Used by the TPU session scripts to confirm the axon tunnel is healthy
before launching a long bench process (a killed-mid-transfer predecessor
can wedge the tunnel for ~10-30 min; see CLAUDE.md env rules).
"""
import numpy as np
import jax
import jax.numpy as jnp

x = np.asarray(jax.jit(lambda: jnp.arange(8, dtype=jnp.float32) + 1)())
assert x.sum() == 36.0, x
print("canary ok", flush=True)
