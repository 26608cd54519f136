"""Pilot cold-start prefix wall profiler (fetch-differenced, real TPU).

Times the three prefix building blocks of the fused pilot chain at BOTH
the replicated size (what every device pays today) and the per-device
sharded size (what one device pays under
``make_sharded_pilot_rx(shard_prefix=True)``):

* window-search training over W windows vs a ceil(W/ndev) chunk,
* per-mode alignment heavy part for both modes vs one mode,
* two-stage pilot training for both modes (vmapped, as the replicated
  chain runs it) vs one mode.

The sharded cold-start prefix wall is then
``P_sh(n) = t_sync(chunk) + t_align(1) + t_eq(1) + n_coll * t_coll`` and
the frame-parallel efficiency
``e(n, k) = (P1 + n k D) / (n (P_sh(n) + k D))`` with D the measured
frame-body marginal (docs/PERFORMANCE.md). Uses the same capture file as
tools/pilotprof.py (written by a plain ``python bench.py`` run).

Usage: python tools/prefixprof.py [--tx PATH] [--ndev 8]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/qampy_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp  # noqa: E402

from qampy_tpu.ops.pilot_chain import make_pilot_rx_chain  # noqa: E402

REPS_A, REPS_B = 3, 13


def timeit(fn, Er, Ei, label):
    """Fetch-differenced wall of one jitted real->real program.

    ``fn(er, ei, scale)`` must apply ``scale`` INSIDE, to the slice it
    actually reads — scaling the whole 32 M-sample capture costs ~0.6 ms
    of HBM traffic per rep and would swamp the prefix stages under test.
    """
    def make(reps):
        @jax.jit
        def timed(er, ei, s0):
            def body(i, carry):
                scale = (1 + 1e-6 * carry).astype(jnp.float32)
                return fn(er, ei, scale).astype(jnp.float32)
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
    print("%-34s %8.3f ms" % (label, dt * 1e3), flush=True)
    return dt


def main():
    argv = list(sys.argv[1:])
    path, ndev, bs, niter = "/tmp/qampy_pilot_tx_nf244.npz", 8, 256, 30
    if "--tx" in argv:
        i = argv.index("--tx")
        path = argv[i + 1]
        del argv[i:i + 2]
    if "--ndev" in argv:
        i = argv.index("--ndev")
        ndev = int(argv[i + 1])
        del argv[i:i + 2]
    if "--bs" in argv:
        i = argv.index("--bs")
        bs = int(argv[i + 1])
        del argv[i:i + 2]
    if "--niter" in argv:
        i = argv.index("--niter")
        niter = int(argv[i + 1])
        del argv[i:i + 2]
    d = np.load(path)
    M, F, P, R, NF = [int(x) for x in d["meta"]]
    seq = (d["seq_r"] + 1j * d["seq_i"]).astype(np.complex64)
    ph = (d["ph_r"] + 1j * d["ph_i"]).astype(np.complex64)
    np.asarray(jax.jit(lambda: jnp.zeros(4, jnp.float32))())
    Er = jax.device_put(d["Er"])
    Ei = jax.device_put(d["Ei"])
    fwd = make_pilot_rx_chain(seq, ph, F, R, os=2, M=M, nmodes=2,
                              sync_Ntaps=17, sync_mu=5e-3, sync_Niter=10,
                              Ntaps=45, mu=(1e-3, 1e-3), Niter=niter,
                              cpe_avg=3, block_size=bs, frames=(0,))
    parts = fwd._prefix_parts
    W = parts["W"]
    chunk = -(-W // ndev)
    print("W=%d windows, chunk=%d (ndev=%d, block_size=%d, Niter=%d)"
          % (W, chunk, ndev, bs, niter))

    import jax.lax as lax
    step = parts["step"]

    def _sl(er, ei, scale, cols):
        # scale only the prefix slice the stage reads (see timeit note)
        return (lax.slice(er, (0, 0), (er.shape[0], cols)) * scale,
                lax.slice(ei, (0, 0), (ei.shape[0], cols)) * scale)

    def sync_w(wcount):
        cols = (wcount + 3) * step

        def f(er, ei, scale):
            e1, e2 = _sl(er, ei, scale, cols)
            wxs, evars = parts["sync_subset"](e1, e2, 0, wcount)
            return jnp.sum(jnp.abs(wxs)) + jnp.sum(evars)
        return f

    def align_n(nm):
        cols = 16 * step

        def f(er, ei, scale):
            e1, e2 = _sl(er, ei, scale, cols)
            acc = jnp.zeros((), jnp.float32)
            for l in range(nm):
                acm2, delays2, foe_l = parts["align"](
                    e1, e2, jnp.asarray(np.zeros((2, 2, 17), np.complex64)),
                    jnp.int32(4 + l), l, jnp.float32)
                acc = acc + jnp.sum(acm2) + jnp.sum(delays2) + foe_l
            return acc
        return f

    def eq_n(nm):
        cols = 8 * step

        def f(er, ei, scale):
            e1, e2 = _sl(er, ei, scale, cols)
            acc = jnp.zeros((), jnp.float32)
            mo = jnp.arange(2)
            for i in range(nm):
                w = parts["train_mode"](e1, e2, jnp.int32(1000 + i), mo, i)
                acc = acc + jnp.sum(jnp.abs(w))
            return acc
        return f

    def eq_vmapped():
        # the replicated chain trains both modes in ONE vmapped call —
        # this is the honest P1 term (eq_n(2) would double-count the
        # batching win)
        cols = 8 * step

        def f(er, ei, scale):
            e1, e2 = _sl(er, ei, scale, cols)
            mo = jnp.arange(2)
            w = jax.vmap(lambda i: parts["train_mode"](
                e1, e2, jnp.int32(1000) + i, mo, i))(jnp.arange(2))
            return jnp.sum(jnp.abs(w))
        return f

    # LS (closed-form) pilot trainer probes: same chain geometry but
    # eq_trainer="ls" — one Gram matmul + real-block solve per mode
    fwd_ls = make_pilot_rx_chain(seq, ph, F, R, os=2, M=M, nmodes=2,
                                 sync_Ntaps=17, sync_mu=5e-3, sync_Niter=10,
                                 Ntaps=45, mu=(1e-3, 1e-3), Niter=niter,
                                 cpe_avg=3, block_size=bs, frames=(0,),
                                 eq_trainer="ls")
    parts_ls = fwd_ls._prefix_parts

    def eq_ls(nm):
        cols = 8 * step

        def f(er, ei, scale):
            e1, e2 = _sl(er, ei, scale, cols)
            mo = jnp.arange(2)
            if nm == 1:
                w = parts_ls["train_mode"](e1, e2, jnp.int32(1000), mo, 0)
                return jnp.sum(jnp.abs(w))
            w = jax.vmap(lambda i: parts_ls["train_mode"](
                e1, e2, jnp.int32(1000) + i, mo, i))(jnp.arange(2))
            return jnp.sum(jnp.abs(w))
        return f

    t_sync_full = timeit(sync_w(W), Er, Ei, "sync search, W=%d" % W)
    t_sync_chunk = timeit(sync_w(chunk), Er, Ei,
                          "sync search, chunk=%d" % chunk)
    t_align2 = timeit(align_n(2), Er, Ei, "alignment, both modes")
    t_align1 = timeit(align_n(1), Er, Ei, "alignment, one mode")
    t_eq2 = timeit(eq_vmapped(), Er, Ei, "pilot training, both (vmapped)")
    t_eq1 = timeit(eq_n(1), Er, Ei, "pilot training, one mode")
    t_ls2 = timeit(eq_ls(2), Er, Ei, "LS pilot training, both (vmapped)")
    t_ls1 = timeit(eq_ls(1), Er, Ei, "LS pilot training, one mode")

    for name, s1, a1, q2, q1 in (
            ("lms", t_sync_full, t_align2, t_eq2, t_eq1),
            ("ls", t_sync_full, t_align2, t_ls2, t_ls1)):
        P1 = (s1 + a1 + q2) * 1e3
        for t_coll_us in (2.0, 10.0, 25.0):
            Psh = ((t_sync_chunk + t_align1 + q1) * 1e3
                   + 6 * t_coll_us / 1e3)
            print("\n-- %s trainer, t_coll=%.0f us: P1=%.3f ms, "
                  "P_sh(%d)=%.3f ms --" % (name, t_coll_us, P1, ndev, Psh))
            for D in (0.080,):
                print("e(n,k) with D=%.3f ms/frame:" % D)
                for k in (10, 40, 80, 120):
                    e = (P1 + ndev * k * D) / (ndev * (Psh + k * D))
                    print("  e(%d,%3d) = %.3f" % (ndev, k, e))


if __name__ == "__main__":
    main()
