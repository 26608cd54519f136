"""Core algorithm layer: pure functions on plain (nmodes, nsamples) arrays.

Mirrors the reference's qampy/core layer (plain ndarray in / ndarray out,
explicitly not signal-object-preserving); all implementations here are
jnp/XLA based.
"""
from qampy_tpu.core import (
    sync,
    metrics,
    special,
    filter,
    resample,
    impairments,
    analog_frontend,
    digital_pre_compensation,
    io,
)

# aliases matching the reference core module names
ber_functions = sync
signal_quality = metrics
special_fcts = special
