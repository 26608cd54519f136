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


def __getattr__(name):
    # lazy aliases for reference-layout module names that live in ops/
    # (importing them eagerly here would be a circular import)
    if name == "equalisation":
        from qampy_tpu.ops import equaliser
        return equaliser
    if name == "phaserecovery":
        from qampy_tpu.ops import phase
        return phase
    if name == "pilotbased_receiver":
        from qampy_tpu.ops import pilots
        return pilots
    if name == "pilotbased_transmitter":
        # NOTE: must go through importlib: a `from qampy_tpu.core import ...`
        # here re-enters this __getattr__ via hasattr() before the submodule
        # import starts, recursing forever
        import importlib
        return importlib.import_module("qampy_tpu.core.pilotbased_transmitter")
    if name == "prbs":
        from qampy_tpu import prbs
        return prbs
    if name == "utils":
        from qampy_tpu import utils
        return utils
    raise AttributeError(name)
