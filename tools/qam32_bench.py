"""SER-gated 32-QAM (cross constellation) fused-chain bench on the real TPU.

Evidence for the general-constellation fast path: the cross 32-QAM chain
(MCMA -> SBD -> BPS, the reference's canonical 32-QAM method pair from
Scripts/32_qam_equalisation.py:16-29 plus phase search) must land within
~2x of the square 64-QAM headline figure, BER/SER-gated like bench.py.

The TX/channel match bench.py's flagship workload (RRC 2x, 20 kHz phase
noise, 35 dB, PMD) with M=32; the gate decides nearest constellation
point over the FULL alphabet (cross grids have no per-axis quantiser),
minimised over pi/2 rotations x pol pairing x taps-centre offset.

Run: python tools/qam32_bench.py   (real TPU, one process at a time)
"""
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main(M=32, methods=("mcma", "sbd"), trs=2 ** 14, block_size=256,
         bps_mode="single", gate_thr=1e-4, Nsym=2 ** 20, cpu=False):
    import jax
    if cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/qampy_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from bench import make_tx
    from qampy_tpu.ops.chain import make_rx_chain

    print("devices: %s" % jax.devices(), file=sys.stderr, flush=True)

    def fetch(x, what="value"):
        for attempt in range(4):
            try:
                return np.asarray(x)
            except Exception as e:
                print("d2h %s attempt %d failed: %s" % (what, attempt, e),
                      file=sys.stderr, flush=True)
                time.sleep(5)
        raise RuntimeError("device->host transfer failed for %s" % what)

    fetch(jax.jit(lambda: jnp.zeros(8, jnp.float32))(), "warmup")
    E_np, syms_np, const_np = make_tx(Nsym, M=M)
    print("tx ready", file=sys.stderr, flush=True)
    constr = np.ascontiguousarray(const_np.real).astype(np.float32)
    consti = np.ascontiguousarray(const_np.imag).astype(np.float32)

    @jax.jit
    def gate(out, refr, refi, cr, ci):
        # nearest-point decisions over the full alphabet (no per-axis
        # quantiser exists for a cross grid); SER minimised over pi/2
        # rotations x pol pairing x taps-centre offsets, all on device
        # (complex buffers cannot cross the axon tunnel)
        c = cr + 1j * ci
        ref = refr + 1j * refi
        o = out[:, 200:-200]
        L = o.shape[1]

        def decide_idx(z):
            # |z - s|^2 argmin == argmax(2<z,s> - |s|^2): one (L,2)x(2,M)
            # matmul instead of an O(L*M) complex abs
            zz = jnp.stack([z.real, z.imag], axis=-1)
            ss = jnp.stack([c.real, c.imag], axis=0)
            score = 2 * (zz @ ss) - (jnp.abs(c) ** 2)[None, :]
            return jnp.argmax(score, axis=-1)

        def ref_idx(z):
            return decide_idx(z)

        # per-(output mode, ref mode) SER minimised over rotations/offsets,
        # then the pol pairing restricted to PERMUTATIONS (mode0->a,
        # mode1->b, a != b): a degenerate chain emitting the same pol on
        # both outputs cannot pass by matching one reference twice
        nm = o.shape[0]
        ser_mr = []
        for m in range(nm):
            decs = [decide_idx(o[m] * (1j ** rot)) for rot in range(4)]
            row = []
            for refm in range(ref.shape[0]):
                cand = []
                for off in (3, 4, 5):
                    rseg = jax.lax.dynamic_slice(ref, (refm, 200 + off),
                                                 (1, L))[0]
                    ridx = ref_idx(rseg)
                    for dec in decs:
                        cand.append(jnp.mean((dec != ridx)
                                             .astype(jnp.float32)))
                row.append(jnp.min(jnp.stack(cand)))
            ser_mr.append(row)
        import itertools
        perms = [jnp.mean(jnp.stack([ser_mr[m][p[m]] for m in range(nm)]))
                 for p in itertools.permutations(range(nm))]
        return jnp.min(jnp.stack(perms))

    Er = jax.device_put(np.ascontiguousarray(E_np.real).astype(np.float32))
    Ei = jax.device_put(np.ascontiguousarray(E_np.imag).astype(np.float32))
    refr = jax.device_put(np.ascontiguousarray(syms_np.real).astype(np.float32))
    refi = jax.device_put(np.ascontiguousarray(syms_np.imag).astype(np.float32))
    fwd_c = make_rx_chain(M=M, Ntaps=17, os=2, methods=methods, mu=1.9e-3,
                          bps_angles=64, bps_N=14, block_size=block_size,
                          TrSyms=trs, bps_mode=bps_mode)
    if not cpu:  # on TPU the cross grid must ride the fused Pallas path
        assert fwd_c.backend_info["pallas"], fwd_c.backend_info["reasons"]

    def fwd(er, ei):
        return fwd_c(er + 1j * ei)

    chain = jax.jit(fwd)
    print("compiling %d-QAM chain (bs=%d trs=%d %s)..."
          % (M, block_size, trs, bps_mode), file=sys.stderr, flush=True)
    for attempt in range(5):
        try:
            out = jax.block_until_ready(chain(Er, Ei))
            break
        except Exception as e:
            print("chain attempt %d failed: %s" % (attempt, str(e)[:150]),
                  file=sys.stderr, flush=True)
            time.sleep(10)
    else:
        raise RuntimeError("chain execution failed after retries")
    best = float(fetch(jax.block_until_ready(
        gate(out, refr, refi, jnp.asarray(constr), jnp.asarray(consti))),
        "gate"))
    print("gate SER=%.2e" % best, file=sys.stderr, flush=True)
    if best > gate_thr:
        print("SER gate failed: %.2e > %.0e" % (best, gate_thr),
              file=sys.stderr, flush=True)
        sys.exit(3)

    REPS_A, REPS_B = 5, 45

    def make_timed(reps):
        @jax.jit
        def timed(er, ei, s0):
            def body(i, carry):
                scale = (1 + 1e-6 * carry).astype(jnp.float32)
                o = fwd(er * scale, ei * scale)
                return jnp.mean(jnp.abs(o)).astype(jnp.float32)

            return jax.lax.fori_loop(0, reps, body, s0)
        return timed

    timedA, timedB = make_timed(REPS_A), make_timed(REPS_B)
    fetch(timedA(Er, Ei, jnp.float32(0.)), "warmA")
    fetch(timedB(Er, Ei, jnp.float32(0.5)), "warmB")

    def run(f, seed):
        t0 = time.perf_counter()
        fetch(f(Er, Ei, jnp.float32(seed)), "timed")
        return time.perf_counter() - t0

    tA = min(run(timedA, 1.0), run(timedA, 2.0))
    tB = min(run(timedB, 3.0), run(timedB, 4.0))
    dt = max(tB - tA, 1e-9) / (REPS_B - REPS_A)
    msym_s = Nsym * 2 / dt / 1e6
    print("per-chain %.2f ms" % (dt * 1e3), file=sys.stderr, flush=True)
    print(json.dumps({
        "metric": "dual-pol %d-QAM %s->BPS throughput (SER=%.1e)"
                  % (M, "->".join(methods), best),
        "value": round(msym_s, 2), "unit": "Msym/s/chip"}))


if __name__ == "__main__":
    args = sys.argv[1:]
    M = int(args[0]) if args and args[0].isdigit() else 32
    mode = "decimated" if "decimated" in args else "single"
    main(M=M, bps_mode=mode)
