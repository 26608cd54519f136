"""Shared example bootstrap: repo path + CPU default platform.

Examples default to CPU (small pedagogic workloads; complex arrays cannot
cross the axon TPU tunnel) — override with QAMPY_EXAMPLES_PLATFORM=tpu for
a directly-attached accelerator.
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))  # repo root
import os as _os
import jax as _jax
_jax.config.update("jax_platforms",
                   _os.environ.get("QAMPY_EXAMPLES_PLATFORM", "cpu"))
