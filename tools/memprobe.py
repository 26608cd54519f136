"""Compiled-program HBM budget probe (AOT, no execution).

Lowers+compiles the flagship blind chain and the pilot chain at serving
sizes and prints XLA's memory analysis (argument/output/temp bytes) — the
numbers behind docs/PERFORMANCE.md §long-capture's single-dispatch HBM
budget. Run on the TPU backend: `python tools/memprobe.py [L_exp]`.
"""
import json
import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp


def probe_blind(L_exp=21):
    from qampy_tpu.ops.chain import make_rx_chain
    L = 2 ** L_exp
    fwd = make_rx_chain(M=64, Ntaps=17, os=2, methods=("mcma", "mddma"),
                        mu=1.9e-3, bps_angles=64, bps_N=14, TrSyms=2 ** 14,
                        block_size=256, bps_mode="twostage")

    def f(er, ei):
        return fwd(er + 1j * ei)

    sd = jax.ShapeDtypeStruct((2, L), jnp.float32)
    comp = jax.jit(f).lower(sd, sd).compile()
    return comp.memory_analysis()


def probe_pilot(nframes=80):
    from qampy_tpu.ops.pilot_chain import make_pilot_rx_chain
    M, F, P, R = 64, 2 ** 16, 1024, 32
    rng = np.random.default_rng(0)
    seq = (rng.standard_normal((2, P)) + 1j * rng.standard_normal((2, P))
           ).astype(np.complex64)
    nph = (F - P) // R
    ph = (rng.standard_normal((2, nph)) + 1j * rng.standard_normal((2, nph))
          ).astype(np.complex64)
    fwd = make_pilot_rx_chain(seq, ph, F, R, os=2, M=M, nmodes=2, Ntaps=45,
                              mu=(1e-3, 1e-3), Niter=30, cpe_avg=3,
                              frames=tuple(range(nframes)),
                              return_phase=False, pallas=True)
    L = (nframes + 4) * F * 2

    def f(er, ei):
        return fwd(er + 1j * ei)

    sd = jax.ShapeDtypeStruct((2, L), jnp.float32)
    comp = jax.jit(f).lower(sd, sd).compile()
    return comp.memory_analysis()


def fmt(ma):
    if ma is None:
        return {"unavailable": True}
    out = {}
    for k in ("argument_size_in_bytes", "output_size_in_bytes",
              "temp_size_in_bytes", "generated_code_size_in_bytes",
              "alias_size_in_bytes"):
        v = getattr(ma, k, None)
        if v is not None:
            out[k.replace("_size_in_bytes", "_MB")] = round(v / 2 ** 20, 1)
    return out


if __name__ == "__main__":
    L_exp = int(sys.argv[1]) if len(sys.argv) > 1 else 21
    try:
        print(json.dumps({"blind_2^%d" % L_exp: fmt(probe_blind(L_exp))}))
    except Exception as e:
        print(json.dumps({"blind_error": str(e)[:200]}))
    try:
        print(json.dumps({"pilot_80f": fmt(probe_pilot(80))}))
    except Exception as e:
        print(json.dumps({"pilot_error": str(e)[:200]}))
