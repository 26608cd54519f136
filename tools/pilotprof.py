"""Per-stage timing of the fused pilot chain on TPU (fetch-differenced)."""
import sys, time
import numpy as np
sys.path.insert(0, ".")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/qampy_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from qampy_tpu.ops.pilot_chain import make_pilot_rx_chain

REPS_A, REPS_B = 3, 13

def timeit(fwd, Er, Ei, label):
    def make(reps):
        @jax.jit
        def timed(er, ei, s0):
            def body(i, carry):
                scale = (1 + 1e-6 * carry).astype(jnp.float32)
                out, _ = fwd(er * scale + 1j * (ei * scale))
                if out.ndim:
                    out = jnp.mean(jnp.abs(out))
                return out.real.astype(jnp.float32)
            return jax.lax.fori_loop(0, reps, body, s0)
        return timed
    tA, tB = make(REPS_A), make(REPS_B)
    np.asarray(tA(Er, Ei, jnp.float32(0.)))
    np.asarray(tB(Er, Ei, jnp.float32(0.5)))
    def run(f, seed):
        t0 = time.perf_counter()
        np.asarray(f(Er, Ei, jnp.float32(seed)))
        return time.perf_counter() - t0
    a = min(run(tA, 1.0), run(tA, 2.0))
    b = min(run(tB, 3.0), run(tB, 4.0))
    dt = max(b - a, 1e-9) / (REPS_B - REPS_A)
    print("%-28s %8.2f ms" % (label, dt * 1e3), flush=True)
    return dt

def main():
    argv = list(sys.argv[1:])
    # default to the capture a plain `python bench.py` run writes
    # (244 frames); pass --tx for a capture made with --pilot-maketx <n>
    path, nframes, block_size = "/tmp/qampy_pilot_tx_nf244.npz", 10, 128
    if "--tx" in argv:
        i = argv.index("--tx"); path = argv[i + 1]; del argv[i:i + 2]
    if "--frames" in argv:
        i = argv.index("--frames"); nframes = int(argv[i + 1]); del argv[i:i + 2]
    if "--bs" in argv:
        i = argv.index("--bs"); block_size = int(argv[i + 1]); del argv[i:i + 2]
    d = np.load(path)
    M, F, P, R, NF = [int(x) for x in d["meta"]]
    seq = (d["seq_r"] + 1j * d["seq_i"]).astype(np.complex64)
    ph = (d["ph_r"] + 1j * d["ph_i"]).astype(np.complex64)
    # warm the transfer path BEFORE the big device_puts (pilot_main order;
    # a large h2d as the session's first transfer has been seen to wedge)
    np.asarray(jax.jit(lambda: jnp.zeros(4, jnp.float32))())
    Er = jax.device_put(d["Er"]); Ei = jax.device_put(d["Ei"])
    stages = argv or ["sync_train", "sync", "eq", "filter", None]
    kw = dict(os=2, M=M, nmodes=2, sync_Ntaps=17, sync_mu=5e-3, sync_Niter=10,
              Ntaps=45, mu=(1e-3, 1e-3), Niter=30, cpe_avg=3,
              block_size=block_size, frames=tuple(range(nframes)))
    for st in stages:
        st = None if st in (None, "full") else st
        fwd = make_pilot_rx_chain(seq, ph, F, R, _stage=st, **kw)
        timeit(fwd, Er, Ei, str(st))

if __name__ == "__main__":
    main()
