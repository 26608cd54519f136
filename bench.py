"""Benchmark: flagship RX chain throughput on one chip.

Workload (BASELINE.json config): dual-pol 64-QAM, 2 samples/symbol,
CMA -> RDE adaptive 2x2 MIMO equalisation + blind phase search, end-to-end.
Prints one JSON line: {"metric", "value", "unit", "vs_baseline"} where the
baseline is the driver-set north star of 100 Msym/s/chip.
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import jax.random as jr
    import qampy_tpu as qt
    from qampy_tpu import impairments
    sys.path.insert(0, ".")
    from __graft_entry__ import _flagship_fn

    Nsym = 2 ** 20
    fb = 25e9
    sig = qt.SignalQAMGrayCoded(64, Nsym, nmodes=2, fb=fb, seed=1)
    up = sig.resample(2 * fb, beta=0.1)
    s = impairments.apply_phase_noise(up, 20e3, key=jr.PRNGKey(5))
    s = impairments.change_snr(s, 35, key=jr.PRNGKey(3))
    s = impairments.apply_PMD(s, np.pi / 5.6, 50e-12)
    E = jnp.asarray(np.asarray(s).astype(np.complex64))

    fn = jax.jit(_flagship_fn(M=64, Ntaps=17, os=2, bps_angles=64, bps_N=14,
                              block_size=64))
    out = jax.block_until_ready(fn(E))  # compile
    # correctness gate: the chain must actually decode
    rec = sig.replace(samples=np.asarray(out)[:, 100:-100])
    ser = float(np.mean(np.asarray(rec.cal_ser())))
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(E)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    msym_s = Nsym * 2 / dt / 1e6  # dual-pol: 2 modes x Nsym symbols each
    result = {
        "metric": "dual-pol 64-QAM CMA->RDE->BPS end-to-end throughput (SER=%.1e)" % ser,
        "value": round(msym_s, 2),
        "unit": "Msym/s/chip",
        "vs_baseline": round(msym_s / 100.0, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
