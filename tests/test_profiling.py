"""Benchmark-harness smoke tests (reference test/test_benchmarks.py role)."""
import numpy as np

from qampy_tpu import profiling


class TestHarness:
    def test_run_benchmarks_small(self):
        res = profiling.run_benchmarks(nsyms=2 ** 12, reps=1, methods=("cma",))
        expected = {"decision", "bps", "train_cma", "apply_filter", "soft_llr",
                    "select_angles"}
        assert expected <= set(res)
        assert all(v > 0 for v in res.values())

    def test_time_fn(self):
        import jax.numpy as jnp
        import jax
        f = jax.jit(lambda x: x * 2)
        t = profiling.time_fn(f, jnp.ones(16), reps=2)
        assert t > 0
