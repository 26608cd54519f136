"""A/B pilot-chain frame-body variants on the real TPU (fetch-differenced).

Variants of the 80-frame serving dispatch: phase-trace output on/off and
frame-scan unroll factor. BER-gated once per variant (must stay exactly
at the baseline's BER).

Run: python tools/pilot_ab.py /tmp/qampy_pilot_tx_nf84.npz 80
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax  # noqa: E402
if "--cpu" in sys.argv:  # smoke-test the harness off the TPU
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/qampy_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp  # noqa: E402
from qampy_tpu.ops.pilot_chain import make_pilot_rx_chain  # noqa: E402
from qampy_tpu.core.metrics import decision_idx  # noqa: E402

REPS_A, REPS_B = 3, 13


def timeit_state(fwd_state, Er, Ei, state=()):
    """Fetch-differenced timing of ``fwd_state(E, *state) -> data``; any
    warm-start state rides through as jit arguments."""
    def make(reps):
        @jax.jit
        def timed(er, ei, s0, *state_a):
            def body(i, carry):
                scale = (1 + 1e-6 * carry).astype(jnp.float32)
                data = fwd_state(er * scale + 1j * (ei * scale), *state_a)
                return jnp.mean(jnp.abs(data)).astype(jnp.float32)
            return jax.lax.fori_loop(0, reps, body, s0)
        return timed

    tA, tB = make(REPS_A), make(REPS_B)
    np.asarray(tA(Er, Ei, jnp.float32(0.), *state))
    np.asarray(tB(Er, Ei, jnp.float32(0.5), *state))

    def run(f, seed):
        t0 = time.perf_counter()
        np.asarray(f(Er, Ei, jnp.float32(seed), *state))
        return time.perf_counter() - t0

    a = min(run(tA, 1.0), run(tA, 2.0))
    b = min(run(tB, 3.0), run(tB, 4.0))
    return max(b - a, 1e-9) / (REPS_B - REPS_A)


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/qampy_pilot_tx_nf84.npz"
    nfp = int(sys.argv[2]) if len(sys.argv) > 2 else 80
    d = np.load(path)
    M, F, P, R, NF = [int(x) for x in d["meta"]]
    seq = (d["seq_r"] + 1j * d["seq_i"]).astype(np.complex64)
    ph = (d["ph_r"] + 1j * d["ph_i"]).astype(np.complex64)
    coded = (d["coded_r"] + 1j * d["coded_i"]).astype(np.complex64)
    frames = tuple(range(nfp))
    idx_tx = np.tile(d["idx_tx"], (1, nfp))
    bits_h = d["bits_tbl"].astype(np.float32)
    nsym = idx_tx.shape[-1] * idx_tx.shape[0]
    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    np.asarray(jax.jit(lambda: jnp.zeros(4, jnp.float32))())
    Er = jax.device_put(d["Er"])
    Ei = jax.device_put(d["Ei"])

    kw = dict(os=2, M=M, nmodes=2, sync_Ntaps=17, sync_mu=5e-3,
              sync_Niter=10, Ntaps=45, mu=(1e-3, 1e-3), Niter=30,
              cpe_avg=3, frames=frames, block_size=256)
    variants = [
        ("baseline", dict()),
        ("nophase", dict(return_phase=False)),
        ("nophase+unroll4", dict(return_phase=False, frames_unroll=4)),
        ("nophase+unroll8", dict(return_phase=False, frames_unroll=8)),
        ("span", dict(frames_mode="span")),
        ("span+nophase", dict(frames_mode="span", return_phase=False)),
        # planes-pipeline A/B: per-frame scan vs whole-span filter+CPE
        ("scan_planes", dict(frames_mode="scan", return_phase=False,
                             frames_unroll=4)),
        ("span_planes", dict(frames_mode="span_planes",
                             return_phase=False)),
        ("tracking", dict(return_phase=False, frames_unroll=4)),
        ("tracking_scan", dict(frames_mode="scan", return_phase=False,
                               frames_unroll=4)),
        # prefix lever: bigger trainer blocks halve the sequential block
        # count of the 3x2 pilot trainings (convergence kept by Niter,
        # BER-gated)
        ("bs512", dict(return_phase=False, frames_unroll=4,
                       block_size=512)),
        ("bs512_sync5", dict(return_phase=False, frames_unroll=4,
                             block_size=512, sync_Niter=5)),
    ]
    if len(sys.argv) > 3:  # run only the named variants
        names = set(sys.argv[3].split(","))
        variants = [v for v in variants if v[0] in names]
    def _ber(data):
        idx_rx = decision_idx(data, coded)
        bt = jnp.asarray(bits_h)
        it = jnp.asarray(idx_tx)
        return jnp.mean((bt[idx_rx] != bt[it]).astype(jnp.float32))

    for name, extra in variants:
        fwd = make_pilot_rx_chain(seq, ph, F, R, **{**kw, **extra})
        if name.startswith("tracking"):
            # warm-start serving: run the full chain ONCE to get taps/shift
            # (device-resident; complex taps never cross the tunnel), then
            # gate+time the zero-prefix tracking entry. The state is passed
            # as jit ARGUMENTS, not closure constants (lowering a complex
            # closure constant fetches it to host — tunnel-fatal).
            track = fwd.tracking

            @jax.jit
            def acquire(er, ei):
                _, info = fwd(er + 1j * ei)
                return info["taps"], info["shift"], info["mode_order"]

            state = acquire(Er, Ei)

            def fwd_state(e, taps, shift, mo):
                return track(e, taps, shift, mo)[0]
        else:
            state = ()

            def fwd_state(e, *unused):
                return fwd(e)[0]

        gate_fn = jax.jit(lambda er, ei, *s: _ber(fwd_state(er + 1j * ei, *s)))
        for attempt in range(3):
            try:
                ber = float(np.asarray(gate_fn(Er, Ei, *state)))
                break
            except Exception as e:
                print("%s gate attempt %d failed: %s" % (name, attempt,
                                                         str(e)[:150]),
                      file=sys.stderr, flush=True)
                time.sleep(10)
        else:
            print("%-18s EXECUTION FAILED" % name, flush=True)
            continue
        dt = timeit_state(fwd_state, Er, Ei, state)
        print("%-18s %7.2f ms  %7.1f Msym/s  BER=%.2e"
              % (name, dt * 1e3, nsym / dt / 1e6, ber), flush=True)


if __name__ == "__main__":
    main()
