"""Mesh helpers for time-axis sharding."""
from __future__ import annotations

import numpy as np
import jax

#: canonical mesh axis name for the waveform time axis
TIME = "t"


def time_axis():
    return TIME


def make_mesh(n_devices=None, devices=None):
    """Create a 1-D mesh over the time axis.

    On a multi-chip slice the time axis rides ICI; on a single chip this
    degrades to a trivial mesh (the shard_map kernels still compile).
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return jax.sharding.Mesh(np.asarray(devices), (TIME,))
