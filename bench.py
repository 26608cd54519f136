"""Benchmark: flagship RX chain throughput on one chip.

Workload (BASELINE.json config): dual-pol 64-QAM, 2 samples/symbol,
MCMA -> MDDMA adaptive 2x2 MIMO equalisation + blind phase search,
end-to-end (the reference's canonical 64-QAM combination,
Scripts/64_qam_equalisation.py:15-28).
Prints one JSON line: {"metric", "value", "unit", "vs_baseline"} where the
baseline is the driver-set north star of 100 Msym/s/chip.

Platform note: on the axon TPU tunnel, complex arrays must NEVER cross the
host<->device boundary in either direction — a single complex device_put
(any size) poisons the session: every later execution or transfer returns
UNIMPLEMENTED (verified empirically with tools/probe_d2h*.py). The TX signal
is synthesised host-side (numpy), shipped as separate real/imag float32
planes, and recombined inside jit; all fetched results are float32.
"""
import json
import sys
import time

import numpy as np


def make_tx(Nsym=2 ** 20, M=64, fb=25e9, seed=1, const=None, probs=None,
            snr=35):
    """Host-side TX synthesis: QAM (or a caller-supplied ``const``
    alphabet, optionally with non-uniform draw ``probs`` — probabilistic
    shaping), RRC 2x oversampling, phase noise, AWGN at 35 dB, PMD.
    Pure numpy so the TPU only sees the RX workload."""
    from qampy_tpu.theory import cal_symbols_qam, cal_scaling_factor_qam, gray_code_qam
    rng = np.random.default_rng(seed)
    if const is not None:
        const = np.asarray(const).astype(np.complex64).reshape(-1)
        M = const.shape[0]
    else:
        const = (cal_symbols_qam(M) / np.sqrt(cal_scaling_factor_qam(M))).astype(np.complex64)
    g = gray_code_qam(M)
    u = np.zeros_like(g)
    u[g] = np.arange(M)
    coded = const  # power-normalised constellation in gray order
    if probs is not None:
        probs = np.asarray(probs, dtype=np.float64)
        probs = probs / probs.sum()
        sym_idx = rng.choice(M, size=(2, Nsym), p=probs)
        # shaped draws change the mean power; re-normalise the alphabet so
        # the transmitted signal keeps unit symbol power
        p_mean = np.sum(probs * np.abs(const) ** 2)
        coded = (const / np.sqrt(p_mean)).astype(np.complex64)
    else:
        sym_idx = rng.integers(0, M, size=(2, Nsym))
    syms = coded[sym_idx]
    # zero-insertion upsample + RRC shaping (frequency domain)
    os = 2
    L = Nsym * os
    up = np.zeros((2, L), dtype=np.complex64)
    up[:, ::os] = syms
    f = np.fft.fftfreq(L) * (os * fb)
    T = 1 / fb
    beta = 0.1
    af = np.abs(f)
    rc = np.zeros(L)
    rc[af <= (1 - beta) / (2 * T)] = T
    mask = (af > (1 - beta) / (2 * T)) & (af <= (1 + beta) / (2 * T))
    rc[mask] = T / 2 * (1 + np.cos(np.pi * T / beta * (af[mask] - (1 - beta) / (2 * T))))
    h = np.sqrt(rc)
    h /= h.max()
    sig = np.fft.ifft(np.fft.fft(up, axis=-1) * h, axis=-1).astype(np.complex64)
    sig /= np.sqrt(np.mean(np.abs(sig) ** 2, axis=-1, keepdims=True))
    # phase noise (Wiener, 20 kHz combined linewidth)
    var = 2 * np.pi * 20e3 / (os * fb)
    ph = np.cumsum(rng.normal(scale=np.sqrt(var), size=(2, L)), axis=-1)
    sig = sig * np.exp(1j * ph).astype(np.complex64)
    # AWGN (os-aware; default 35 dB)
    n_amp = 10 ** (-snr / 20) * np.sqrt(os)
    sig = sig + (n_amp / np.sqrt(2) * (rng.standard_normal((2, L)) +
                 1j * rng.standard_normal((2, L)))).astype(np.complex64)
    # PMD: rotation + DGD in the frequency domain
    theta = np.pi / 5.6
    t_dgd = 50e-12
    omega = 2 * np.pi * np.linspace(-os * fb / 2, os * fb / 2, L, endpoint=False)
    R = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    Sf = np.fft.fftshift(np.fft.fft(np.fft.ifftshift(sig, axes=-1), axis=-1), axes=-1)
    Sf = R @ Sf
    Sf *= np.exp(np.array([-1, 1])[:, None] * 1j * omega * t_dgd / 2)
    Sf = R.T @ Sf
    sig = np.fft.fftshift(np.fft.ifft(np.fft.ifftshift(Sf, axes=-1), axis=-1), axes=-1)
    return sig.astype(np.complex64), syms.astype(np.complex64), coded


def main():
    import jax
    # persistent compilation cache: retries after transient tunnel errors
    # skip the multi-minute recompile
    jax.config.update("jax_compilation_cache_dir", "/tmp/qampy_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from functools import partial
    sys.path.insert(0, ".")
    from __graft_entry__ import _flagship_fn
    from qampy_tpu.core.metrics import decision_idx

    print("devices: %s" % jax.devices(), file=sys.stderr, flush=True)

    def fetch(x, what="value"):
        # the axon tunnel's first device->host transfer can take minutes and
        # sometimes errors transiently; retry with patience
        for attempt in range(4):
            try:
                return np.asarray(x)
            except Exception as e:
                print("d2h %s attempt %d failed: %s" % (what, attempt, e),
                      file=sys.stderr, flush=True)
                time.sleep(5)
        raise RuntimeError("device->host transfer failed for %s" % what)

    # warm the transfer path before anything timing-sensitive
    fetch(jax.jit(lambda: jnp.zeros(8, jnp.float32))(), "warmup")
    print("d2h warm", file=sys.stderr, flush=True)
    Nsym = 2 ** 20
    E_np, syms_np, const_np = make_tx(Nsym)
    print("tx ready", file=sys.stderr, flush=True)
    const = const_np  # host constant: see _flagship_fn note

    levels = np.unique(const_np.real)
    d0, lo, n = float(levels[1] - levels[0]), float(levels[0]), int(levels.size)

    @jax.jit
    def gate(out, refr, refi):
        # the axon tunnel cannot transfer complex buffers at all, so the
        # whole correctness gate runs on device: SER against tx symbols,
        # minimised over pi/2 rotation x pol pairing x taps-centre offset
        ref = refr + 1j * refi
        o = out[:, 200:-200]

        def decide(z):
            q = lambda x: lo + d0 * jnp.clip(jnp.round((x - lo) / d0), 0, n - 1)
            return q(z.real) + 1j * q(z.imag)

        L = o.shape[1]
        # decisions are independent of the reference alignment: compute the
        # 4 rotated decision sequences once per mode, then compare against
        # every (ref mode, offset) slice — keeps the graph small
        sers = []
        for m in range(o.shape[0]):
            decs = [decide(o[m] * (1j ** rot)) for rot in range(4)]
            cand = []
            for refm in range(ref.shape[0]):
                for off in (3, 4, 5):  # taps-centre offset = (ntaps//2)//os
                    rseg = jax.lax.dynamic_slice(ref, (refm, 200 + off), (1, L))[0]
                    for dec in decs:
                        cand.append(jnp.mean(
                            (jnp.abs(dec - rseg) > d0 / 4).astype(jnp.float32)))
            sers.append(jnp.min(jnp.stack(cand)))
        return jnp.mean(jnp.stack(sers))

    # complex h2d poisons the tunnel: ship real/imag planes separately.
    # The chain's planes-native entry takes the stacked [Re; Im] layout
    # directly, so the capture ships pre-stacked and no complex (or
    # restacked) copy of it ever exists on device
    Pst = jax.device_put(np.concatenate([E_np.real, E_np.imag]
                                        ).astype(np.float32))
    refr = jax.device_put(np.ascontiguousarray(syms_np.real).astype(np.float32))
    refi = jax.device_put(np.ascontiguousarray(syms_np.imag).astype(np.float32))
    if "--blind-tracking" in sys.argv:
        i0 = sys.argv.index("--blind-tracking")
        block_size = int(sys.argv[i0 + 1])
        trs = int(sys.argv[i0 + 2])
        bps_mode = sys.argv[i0 + 3] if len(sys.argv) > i0 + 3 else "single"
        gate_thr = float(sys.argv[i0 + 4]) if len(sys.argv) > i0 + 4 else 1e-4
    elif "--single" in sys.argv:
        i0 = sys.argv.index("--single")
        block_size = int(sys.argv[i0 + 1])
        trs = int(sys.argv[i0 + 2])
        bps_mode = sys.argv[i0 + 3] if len(sys.argv) > i0 + 3 else "single"
        gate_thr = float(sys.argv[i0 + 4]) if len(sys.argv) > i0 + 4 else 1e-4
    else:
        block_size, trs, bps_mode, gate_thr = 256, 2 ** 15, "single", 1e-4
    bps_win = "f32" if bps_mode.endswith("-f32") else "bf16"
    bps_mode = bps_mode.replace("-f32", "")
    # decimated16: N*dec edge samples carry no full window; N=12 keeps
    # 12*16=192 inside the gate's 200-sample trim (N=14 default elsewhere)
    bps_N = 12 if bps_mode == "decimated16" else 14
    fwd_c = _flagship_fn(M=64, Ntaps=17, os=2, bps_angles=64, bps_N=bps_N,
                         block_size=block_size, TrSyms=trs or None,
                         bps_mode=bps_mode, bps_win=bps_win)

    @jax.jit
    def chain(P):
        outr, outi = fwd_c.planes(P)
        return outr + 1j * outi   # complex stays ON DEVICE for the gate

    print("compiling chain (bs=%d trs=%d)..." % (block_size, trs),
          file=sys.stderr, flush=True)
    # the axon tunnel sporadically fails an execution with UNIMPLEMENTED;
    # retry in-process (the compilation cache makes retries cheap)
    for attempt in range(5):
        try:
            out = jax.block_until_ready(chain(Pst))
            break
        except Exception as e:
            print("chain attempt %d failed: %s" % (attempt, str(e)[:150]),
                  file=sys.stderr, flush=True)
            time.sleep(10)
    else:
        raise RuntimeError("chain execution failed after retries")
    print("chain done, compiling gate...", file=sys.stderr, flush=True)
    best = float(fetch(jax.block_until_ready(gate(out, refr, refi)), "gate"))
    print("gate done", file=sys.stderr, flush=True)
    if best > gate_thr:
        # convergence gate: the supervisor falls back to the next attempt
        # (the reference blind-eq tolerance is SER ~ 0, a few errors per
        # 2^16 symbols ~ 6e-5; the fast two-stage attempt is held to a
        # 10x stricter 1e-5)
        print("SER gate failed: %.2e > %.0e" % (best, gate_thr),
              file=sys.stderr, flush=True)
        sys.exit(3)

    if "--blind-tracking" in sys.argv:
        # steady-state blind serving: reuse the frozen taps from the full
        # run above (device-resident; complex taps never cross the
        # tunnel), SER-gate the tracking output, and time the tracking
        # entry — the trainer's serial block steps disappear entirely
        @jax.jit
        def chain_taps(P):
            (outr, outi), w2 = fwd_c.planes_with_taps(P)
            return outr + 1j * outi, w2

        out_t, w2 = chain_taps(Pst)
        best_t = float(fetch(jax.block_until_ready(
            gate(jax.jit(lambda P, w: (lambda o: o[0] + 1j * o[1])(
                fwd_c.tracking_planes(P, w)))(Pst, w2), refr, refi)),
            "gate"))
        print("blind tracking gate SER=%.2e" % best_t, file=sys.stderr,
              flush=True)
        if best_t > gate_thr:
            print("blind tracking SER gate failed", file=sys.stderr,
                  flush=True)
            sys.exit(3)
        REPS_A, REPS_B = 5, 45

        def mk(reps):
            @jax.jit
            def timed(P, w, s0):
                def body(i, carry):
                    scale = (1 + 1e-6 * carry).astype(jnp.float32)
                    outr, outi = fwd_c.tracking_planes(P * scale, w)
                    return (jnp.mean(jnp.abs(outr))
                            + jnp.mean(jnp.abs(outi))).astype(jnp.float32)
                return jax.lax.fori_loop(0, reps, body, s0)
            return timed

        tA_f, tB_f = mk(REPS_A), mk(REPS_B)
        fetch(tA_f(Pst, w2, jnp.float32(0.)), "warmA")
        fetch(tB_f(Pst, w2, jnp.float32(0.5)), "warmB")

        def run_t(f, seed):
            t0 = time.perf_counter()
            fetch(f(Pst, w2, jnp.float32(seed)), "timed")
            return time.perf_counter() - t0

        tA = min(run_t(tA_f, 1.0), run_t(tA_f, 2.0))
        tB = min(run_t(tB_f, 3.0), run_t(tB_f, 4.0))
        dt = max(tB - tA, 1e-9) / (REPS_B - REPS_A)
        print("blind tracking per-chain %.2f ms" % (dt * 1e3),
              file=sys.stderr, flush=True)
        print(json.dumps({
            "blind_tracking_msym_s": round(Nsym * 2 / dt / 1e6, 2),
            "blind_tracking_ser": best_t}))
        return

    # --- timing ---
    # Tunnel semantics (established with tools/probe_timing.py):
    # block_until_ready returns IMMEDIATELY (fully async relay) — only a
    # value fetch marks true completion. And the relay memoizes identical
    # (program, inputs) executions. Protocol: two programs that chain
    # REPS_A and REPS_B data-dependent executions of the chain, each warmed
    # by a full fetch (forces compile + one run), then fetch-timed with
    # fresh seeds; the difference cancels fetch/dispatch overhead:
    #   dt = (t_B - t_A) / (REPS_B - REPS_A)
    REPS_A, REPS_B = 5, 45

    def make_timed(reps):
        @jax.jit
        def timed(P, s0):
            def body(i, carry):
                scale = (1 + 1e-6 * carry).astype(jnp.float32)
                outr, outi = fwd_c.planes(P * scale)
                return (jnp.mean(jnp.abs(outr))
                        + jnp.mean(jnp.abs(outi))).astype(jnp.float32)

            return jax.lax.fori_loop(0, reps, body, s0)
        return timed

    timedA, timedB = make_timed(REPS_A), make_timed(REPS_B)
    fetch(timedA(Pst, jnp.float32(0.)), "warmA")   # compile + full run
    fetch(timedB(Pst, jnp.float32(0.5)), "warmB")

    def run(f, seed):
        t0 = time.perf_counter()
        fetch(f(Pst, jnp.float32(seed)), "timed")
        return time.perf_counter() - t0

    tA = min(run(timedA, 1.0), run(timedA, 2.0))
    tB = min(run(timedB, 3.0), run(timedB, 4.0))
    dt = max(tB - tA, 1e-9) / (REPS_B - REPS_A)
    print("per-chain %.2f ms (tA=%.0f ms tB=%.0f ms)" %
          (dt * 1e3, tA * 1e3, tB * 1e3), file=sys.stderr, flush=True)
    msym_s = Nsym * 2 / dt / 1e6  # dual-pol: 2 modes x Nsym symbols each
    result = {
        "metric": "dual-pol 64-QAM MCMA->MDDMA->BPS end-to-end throughput (SER=%.1e)" % best,
        "value": round(msym_s, 2),
        "unit": "Msym/s/chip",
        "vs_baseline": round(msym_s / 100.0, 3),
    }
    print(json.dumps(result))


def pilot_maketx(path, nframes=42, M=64, shape="qam", snr=35):
    """Synthesise the pilot-chain TX capture on the CPU backend and save it
    as float32 planes + metadata (the TPU subprocess only sees the RX
    workload; complex arrays never cross the tunnel).

    Workload: reference test/sim_pilot_txrx.py / BASELINE config 4 —
    SignalWithPilots(M, 2^16, 1024, 32) dual-pol at 24 GBd, RRC 2x,
    100 kHz-class phase noise, PMD. ``M`` defaults to the flagship 64;
    the reference's own sim_pilot_txrx default is M=128 (:6).
    ``shape="warp"`` replaces the payload with a radially WARPED
    (non-grid) M-point alphabet via SymbolOnlySignal (no gray bit table —
    the bench gates on SER instead of BER for that capture).
    """
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.random as jr
    import qampy_tpu as qt
    M, F, P, R, NF = int(M), 2 ** 16, 1024, 32, int(nframes)
    if shape == "ps":
        # Maxwell-Boltzmann HEAVY shaping (nu=1.5, H=5.56 bits): beyond
        # the blind chain's lock range (docs/PERFORMANCE.md) — the pilot
        # chain's data-aided training + alphabet-free payload path serve
        # it, matching the reference's PS workflow (pilot_based centering
        # notebook). SER-gated (shaped symbols keep the gray table but a
        # BER gate over non-uniform draws mirrors the SER anyway).
        from qampy_tpu import theory as _th
        base = np.asarray(_th.cal_symbols_qam(M)) / np.sqrt(
            float(_th.cal_scaling_factor_qam(M)))
        lv, pl_ = _th.cal_ps_probablts(base, 1.5)
        probs = (pl_[np.searchsorted(lv, base.real)]
                 * pl_[np.searchsorted(lv, base.imag)])
        probs = probs / probs.sum()
        coded = (base / np.sqrt(np.sum(probs * np.abs(base) ** 2))
                 ).astype(np.complex64)
        rng = np.random.default_rng(3)
        npl = (F - P) * (R - 1) // R
        pay = coded[rng.choice(M, size=(2, npl), p=probs)]
        pays = qt.SymbolOnlySignal.from_symbol_array(
            pay, coded_symbols=coded, fb=24e9)
        sig = qt.SignalWithPilots.from_symbol_array(pays, F, P, R,
                                                    nframes=NF)
        bits_tbl = np.zeros((0, 0), np.uint8)
    elif shape == "warp":
        sys.path.insert(0, "tools")
        from genbench import warped_qam
        coded = warped_qam(M)
        rng = np.random.default_rng(3)
        # one frame's worth of payload: SignalWithPilots.from_symbol_array
        # TILES the frame nframes times (reference signals.py:1598)
        npl = (F - P) * (R - 1) // R
        pay = coded[rng.integers(0, M, size=(2, npl))]
        pays = qt.SymbolOnlySignal.from_symbol_array(
            pay, coded_symbols=coded, fb=24e9)
        sig = qt.SignalWithPilots.from_symbol_array(pays, F, P, R,
                                                    nframes=NF)
        bits_tbl = np.zeros((0, 0), np.uint8)
    else:
        sig = qt.SignalWithPilots(M, F, P, R, nframes=NF, nmodes=2,
                                  fb=24e9, seed=3)
        bits_tbl = np.asarray(sig._symbols_obj._encoding).astype(np.uint8)
    s2 = sig.resample(2 * sig.fb, beta=0.1, renormalise=True)
    s2 = qt.impairments.simulate_transmission(
        s2, snr=snr, lwdth=20e3, dgd=20e-12, theta=np.pi / 4.3,
        roll_frame_sync=True, key=jr.PRNGKey(5))
    E = np.asarray(s2.samples).astype(np.complex64)
    coded = np.asarray(sig.coded_symbols).astype(np.complex64)
    pay = np.asarray(sig.get_data(frames=[0]).samples).astype(np.complex64)
    idx_tx = np.argmin(np.abs(pay[:, :, None] - coded[None, None, :]),
                       axis=-1).astype(np.int32)
    np.savez(path,
             Er=np.ascontiguousarray(E.real), Ei=np.ascontiguousarray(E.imag),
             seq_r=np.asarray(sig.pilot_seq).real.astype(np.float32),
             seq_i=np.asarray(sig.pilot_seq).imag.astype(np.float32),
             ph_r=np.asarray(sig.ph_pilots).real.astype(np.float32),
             ph_i=np.asarray(sig.ph_pilots).imag.astype(np.float32),
             coded_r=coded.real.astype(np.float32),
             coded_i=coded.imag.astype(np.float32),
             idx_tx=idx_tx, bits_tbl=bits_tbl,
             meta=np.array([M, F, P, R, NF], dtype=np.int64))
    print("pilot tx ready: %s" % (E.shape,), file=sys.stderr, flush=True)


def pilot_main(path, nframes_proc, gate_ber, eq_trainer="lms",
               frames_unroll=4, frames_pack=1):
    """Time the fused pilot RX chain on the real chip, BER-gated.

    One dispatch = frame sync + two-stage pilot equalisation + per-frame
    filtering and pilot CPE over ``nframes_proc`` frames (the steady-state
    serving pattern). Throughput counts PAYLOAD symbols only (pilot
    overhead excluded). Gate: BER < gate_ber against the known TX bits
    (reference tolerance BER < 1e-5, test/test_pilot_signal.py:103-118).
    """
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/qampy_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    sys.path.insert(0, ".")
    from qampy_tpu.ops.pilot_chain import make_pilot_rx_chain
    from qampy_tpu.core.metrics import decision_idx

    print("devices: %s" % jax.devices(), file=sys.stderr, flush=True)
    d = np.load(path)
    M, F, P, R, NF = [int(x) for x in d["meta"]]
    seq = (d["seq_r"] + 1j * d["seq_i"]).astype(np.complex64)
    ph = (d["ph_r"] + 1j * d["ph_i"]).astype(np.complex64)
    coded = (d["coded_r"] + 1j * d["coded_i"]).astype(np.complex64)
    frames = tuple(range(int(nframes_proc)))
    # eq_trainer="ls": closed-form data-aided pilot equalisation (one Gram
    # matmul + solve; ~0.15 ms vs ~1.1 ms LMS prefix term on chip,
    # tools/prefixprof.py) — BER-gated below exactly like the LMS path
    fwd = make_pilot_rx_chain(seq, ph, F, R, os=2, M=M, nmodes=2,
                              sync_Ntaps=17, sync_mu=5e-3, sync_Niter=10,
                              Ntaps=45, mu=(1e-3, 1e-3), Niter=30,
                              cpe_avg=3, frames=frames, block_size=256,
                              return_phase=False,
                              frames_unroll=int(frames_unroll),
                              frames_pack=int(frames_pack),
                              eq_trainer=eq_trainer)
    idx_tx = np.tile(d["idx_tx"], (1, len(frames)))
    bits_h = d["bits_tbl"].astype(np.float32)
    have_bits = bits_h.size > 0   # gen-alphabet captures carry no gray
    nsym_payload = idx_tx.shape[-1] * idx_tx.shape[0]

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
    Er = jax.device_put(d["Er"])
    Ei = jax.device_put(d["Ei"])

    # the tiled TX index array scales with frames/dispatch (~60 MB at 120
    # frames); as a jit closure constant it bloats the serialized program
    # past what the remote compile helper accepts (160 frames = 81 MB blob
    # -> HTTP 500). Ship it as an ARGUMENT instead. And count bit errors
    # through a host-precomputed (M, M) Hamming-distance LUT: the naive
    # bitmap gather materialises (nmodes, Nsym, log2M) tensors whose
    # minor dim pads 6 -> 128 on TPU — 19 GB of padded HLO temps at 160
    # frames (OOM), ~14 GB at 120.
    it_d = jax.device_put(idx_tx)
    if have_bits:
        Mc = bits_h.shape[0]
        nb = bits_h.shape[1]
        ham_h = (bits_h[:, None, :] != bits_h[None, :, :]).sum(-1).astype(
            np.float32).reshape(-1)

    @jax.jit
    def gate(er, ei, it):
        (dr, di), info = fwd.planes(er, ei)
        idx_rx = decision_idx(dr + 1j * di, coded)
        ser = jnp.mean((idx_rx != it).astype(jnp.float32))
        if have_bits:
            ham = jnp.asarray(ham_h)
            ber = jnp.mean(ham[idx_rx * Mc + it]) / nb
        else:
            ber = ser   # gen alphabets: no gray table, gate on SER
        return ber, ser, info["sync_corr"]

    print("compiling pilot chain (frames=%d)..." % len(frames),
          file=sys.stderr, flush=True)
    for attempt in range(5):
        try:
            res = jax.block_until_ready(gate(Er, Ei, it_d))
            ber, ser, corr = [float(fetch(x, "gate")) for x in res]
            break
        except Exception as e:
            print("pilot attempt %d failed: %s" % (attempt, str(e)[:200]),
                  file=sys.stderr, flush=True)
            time.sleep(10)
    else:
        raise RuntimeError("pilot chain execution failed after retries")
    print("pilot gate: BER=%.2e SER=%.2e sync_corr=%.0f" % (ber, ser, corr),
          file=sys.stderr, flush=True)
    if ber > gate_ber or corr < 120:
        print("pilot gate failed: BER %.2e > %.0e (corr %.0f)"
              % (ber, gate_ber, corr), file=sys.stderr, flush=True)
        sys.exit(3)

    REPS_A, REPS_B = 3, 13

    def make_timed(reps):
        @jax.jit
        def timed(er, ei, s0):
            def body(i, carry):
                scale = (1 + 1e-6 * carry).astype(jnp.float32)
                (dr, di), _ = fwd.planes(er * scale, ei * scale)
                return (jnp.mean(jnp.abs(dr))
                        + jnp.mean(jnp.abs(di))).astype(jnp.float32)

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
    print("pilot per-chain %.2f ms (tA=%.0f ms tB=%.0f ms)"
          % (dt * 1e3, tA * 1e3, tB * 1e3), file=sys.stderr, flush=True)
    msym_s = nsym_payload / dt / 1e6
    print(json.dumps({"pilot_chain_msym_s": round(msym_s, 2),
                      "pilot_chain_ber": ber,
                      "pilot_chain_frames_per_dispatch": len(frames)}))


def pilot_tracking_main(path, nframes_proc, gate_ber):
    """Time the steady-state TRACKING entry (warm-start taps/shift from a
    previous dispatch, zero sync/training prefix) — the serving pattern the
    reference reaches with ``wxinit=`` warm-starting
    (qampy/equalisation.py:386-388). BER-gated like the full chain; the
    warm-start state stays device-resident and rides through jit as
    arguments (complex taps must never cross the tunnel). Uses the
    PLANES-native entry (``forward.tracking_planes``): the capture planes
    feed the frame slices directly and the payload returns as (dr, di)
    planes — no whole-capture complex<->planes conversion pass."""
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/qampy_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    sys.path.insert(0, ".")
    from qampy_tpu.ops.pilot_chain import make_pilot_rx_chain
    from qampy_tpu.core.metrics import decision_idx

    print("devices: %s" % jax.devices(), file=sys.stderr, flush=True)
    d = np.load(path)
    M, F, P, R, NF = [int(x) for x in d["meta"]]
    seq = (d["seq_r"] + 1j * d["seq_i"]).astype(np.complex64)
    ph = (d["ph_r"] + 1j * d["ph_i"]).astype(np.complex64)
    coded = (d["coded_r"] + 1j * d["coded_i"]).astype(np.complex64)
    frames = tuple(range(int(nframes_proc)))
    fwd = make_pilot_rx_chain(seq, ph, F, R, os=2, M=M, nmodes=2,
                              sync_Ntaps=17, sync_mu=5e-3, sync_Niter=10,
                              Ntaps=45, mu=(1e-3, 1e-3), Niter=30,
                              cpe_avg=3, frames=frames, block_size=256,
                              return_phase=False, frames_unroll=4)
    track = fwd.tracking_planes
    idx_tx = np.tile(d["idx_tx"], (1, len(frames)))
    bits_h = d["bits_tbl"].astype(np.float32)
    nsym_payload = idx_tx.shape[-1] * idx_tx.shape[0]
    np.asarray(jax.jit(lambda: jnp.zeros(8, jnp.float32))())
    Er = jax.device_put(d["Er"])
    Ei = jax.device_put(d["Ei"])

    @jax.jit
    def acquire(er, ei):
        _, info = fwd.planes(er, ei)
        return info["taps"], info["shift"], info["mode_order"]

    print("acquiring warm-start state...", file=sys.stderr, flush=True)
    state = jax.block_until_ready(acquire(Er, Ei))

    # Hamming-LUT BER + idx as argument: see pilot_main's gate note
    it_d = jax.device_put(idx_tx)
    Mc, nb = bits_h.shape
    ham_h = (bits_h[:, None, :] != bits_h[None, :, :]).sum(-1).astype(
        np.float32).reshape(-1)

    @jax.jit
    def gate(er, ei, it, taps, shift, mo):
        (dr, di), _ = track(er, ei, taps, shift, mo)
        idx_rx = decision_idx(dr + 1j * di, coded)
        ham = jnp.asarray(ham_h)
        return jnp.mean(ham[idx_rx * Mc + it]) / nb

    ber = float(np.asarray(gate(Er, Ei, it_d, *state)))
    print("tracking gate: BER=%.2e" % ber, file=sys.stderr, flush=True)
    if ber > gate_ber:
        print("tracking gate failed: %.2e > %.0e" % (ber, gate_ber),
              file=sys.stderr, flush=True)
        sys.exit(3)

    REPS_A, REPS_B = 3, 13

    def make_timed(reps):
        @jax.jit
        def timed(er, ei, s0, taps, shift, mo):
            def body(i, carry):
                scale = (1 + 1e-6 * carry).astype(jnp.float32)
                (dr, di), _ = track(er * scale, ei * scale,
                                    taps, shift, mo)
                return (jnp.mean(jnp.abs(dr))
                        + jnp.mean(jnp.abs(di))).astype(jnp.float32)

            return jax.lax.fori_loop(0, reps, body, s0)
        return timed

    def fetch(x):
        return np.asarray(x)

    timedA, timedB = make_timed(REPS_A), make_timed(REPS_B)
    fetch(timedA(Er, Ei, jnp.float32(0.), *state))
    fetch(timedB(Er, Ei, jnp.float32(0.5), *state))

    def run(f, seed):
        t0 = time.perf_counter()
        fetch(f(Er, Ei, jnp.float32(seed), *state))
        return time.perf_counter() - t0

    tA = min(run(timedA, 1.0), run(timedA, 2.0))
    tB = min(run(timedB, 3.0), run(timedB, 4.0))
    dt = max(tB - tA, 1e-9) / (REPS_B - REPS_A)
    msym_s = nsym_payload / dt / 1e6
    print("tracking per-chain %.2f ms" % (dt * 1e3), file=sys.stderr,
          flush=True)
    print(json.dumps({"pilot_tracking_msym_s": round(msym_s, 2),
                      "pilot_tracking_ber": ber}))


def _supervise():
    """Run attempts in isolated subprocesses: a tunnel failure poisons the
    whole process, so each (block_size) attempt gets a fresh interpreter."""
    import subprocess
    # (block_size, training-prefix, bps mode, SER gate) attempts, fastest
    # first: the two-stage BPS (~765 Msym/s) is held to a strict 1e-5 gate;
    # the single-grid config (SER exactly 0 in every measured run) and
    # longer training prefixes are the fallbacks. Each attempt runs in a
    # fresh subprocess because the tunnel is flaky.
    attempts = (
        # decimated carrier recovery first (r5): whole-BPS on the filter's
        # stride-K side output + fused piecewise-linear interp-rotate —
        # measured 2451.0 Msym/s SER 4.8e-7 (K=16, N=12) and 1986.9-2039.1
        # SER exactly 0 (K=8) vs 973 two-stage r4, each held to the strict
        # 1e-5 gate; the r4 modes remain as fallbacks
        (256, 2 ** 14, "decimated16", 1e-5),
        (256, 2 ** 14, "decimated", 1e-5),
        (256, 2 ** 14, "twostage", 1e-5),
        (256, 2 ** 14, "single", 1e-4),
        (256, 2 ** 15, "single", 1e-4),
        (256, 2 ** 16, "single", 1e-4),
    )
    blind = None
    for bs, trs, mode, thr in attempts:
        proc = subprocess.run([sys.executable, __file__, "--single", str(bs),
                               str(trs), mode, repr(thr)],
                              capture_output=True, text=True, timeout=1800)
        line = ""
        for l in proc.stdout.strip().splitlines():
            if l.startswith("{"):
                line = l
        if proc.returncode == 0 and line:
            blind = json.loads(line)
            break
        sys.stderr.write(proc.stderr[-2000:] + "\n")
        sys.stderr.flush()
    if blind is None:
        return 1

    # ---- pilot-chain number (BASELINE config 4), merged into the same
    # JSON line: TX synthesis runs in a CPU-forced subprocess, the timing
    # attempt on the real chip with a BER gate at the reference tolerance
    tx_path = "/tmp/qampy_pilot_tx_nf244.npz"
    try:
        import os.path
        if not os.path.exists(tx_path):
            proc = subprocess.run([sys.executable, __file__,
                                   "--pilot-maketx", tx_path, "244"],
                                  capture_output=True, text=True, timeout=2400)
            if proc.returncode != 0:
                raise RuntimeError("maketx failed: %s" % proc.stderr[-1000:])
        # 240 frames/dispatch amortises the sync+train prefix further than
        # the r3 80-frame config (measured 1370.3 vs 765-861 Msym/s, BER 0;
        # 160 measured 1259.6-1260.7). Large dispatches needed two fixes to
        # compile: idx_tx as a gate ARGUMENT (81 MB closure constant
        # overflowed the remote compile helper) and the Hamming-LUT BER
        # (the bitmap gather's 6->128 minor-dim padding cost 19 GB of HLO
        # temps at 160 frames). 160/80 remain as fallbacks.
        # LS (closed-form) trainer first — measured 1325 Msym/s BER 0 on
        # the gate capture, and it is the cold-start-scaling config
        # (docs/PERFORMANCE.md r5); LMS attempts are the fallback
        for nfp, gate, tr in ((240, 1e-5, "ls"), (240, 1e-5, "lms"),
                              (160, 1e-5, "lms"), (80, 1e-5, "lms")):
            proc = subprocess.run([sys.executable, __file__, "--pilot-single",
                                   tx_path, str(nfp), repr(gate), tr],
                                  capture_output=True, text=True, timeout=1800)
            line = ""
            for l in proc.stdout.strip().splitlines():
                if l.startswith("{"):
                    line = l
            if proc.returncode == 0 and line:
                blind.update(json.loads(line))
                break
            sys.stderr.write(proc.stderr[-2000:] + "\n")
            sys.stderr.flush()
    except Exception as e:
        sys.stderr.write("pilot bench skipped: %s\n" % e)
    # steady-state BLIND tracking (warm-start taps, r5): strictly
    # optional — measured 2603.6 Msym/s SER 4.8e-7 at the decimated16
    # config
    try:
        proc = subprocess.run([sys.executable, __file__, "--blind-tracking",
                               "256", str(2 ** 14), "decimated16", "1e-5"],
                              capture_output=True, text=True, timeout=1800)
        line = ""
        for l in proc.stdout.strip().splitlines():
            if l.startswith("{"):
                line = l
        if proc.returncode == 0 and line:
            blind.update(json.loads(line))
        else:
            sys.stderr.write(proc.stderr[-1000:] + "\n")
    except Exception as e:
        sys.stderr.write("blind tracking bench skipped: %s\n" % e)
    # steady-state tracking number (warm-start serving): strictly optional —
    # a failure or timeout leaves the main numbers untouched
    try:
        proc = subprocess.run([sys.executable, __file__, "--pilot-tracking",
                               tx_path, "240", "1e-5"],
                              capture_output=True, text=True, timeout=1500)
        line = ""
        for l in proc.stdout.strip().splitlines():
            if l.startswith("{"):
                line = l
        if proc.returncode == 0 and line:
            blind.update(json.loads(line))
        else:
            sys.stderr.write(proc.stderr[-1000:] + "\n")
    except Exception as e:
        sys.stderr.write("tracking bench skipped: %s\n" % e)
    print(json.dumps(blind))
    return 0


if __name__ == "__main__":
    if "--single" in sys.argv or "--blind-tracking" in sys.argv:
        main()
    elif "--pilot-maketx" in sys.argv:
        i0 = sys.argv.index("--pilot-maketx")
        a = sys.argv[i0 + 2:]
        nf = int(a[0]) if len(a) > 0 else 42
        Mx = int(a[1]) if len(a) > 1 else 64
        shp = a[2] if len(a) > 2 else "qam"
        snr_ = float(a[3]) if len(a) > 3 else 35
        pilot_maketx(sys.argv[i0 + 1], nf, M=Mx, shape=shp, snr=snr_)
    elif "--pilot-single" in sys.argv:
        i0 = sys.argv.index("--pilot-single")
        tr = (sys.argv[i0 + 4] if len(sys.argv) > i0 + 4
              and not sys.argv[i0 + 4].startswith("-") else "lms")
        ur = (int(sys.argv[i0 + 5]) if len(sys.argv) > i0 + 5
              and sys.argv[i0 + 5].isdigit() else 4)
        pk = (int(sys.argv[i0 + 6]) if len(sys.argv) > i0 + 6
              and sys.argv[i0 + 6].isdigit() else 1)
        pilot_main(sys.argv[i0 + 1], int(sys.argv[i0 + 2]),
                   float(sys.argv[i0 + 3]), eq_trainer=tr,
                   frames_unroll=ur, frames_pack=pk)
    elif "--pilot-tracking" in sys.argv:
        i0 = sys.argv.index("--pilot-tracking")
        pilot_tracking_main(sys.argv[i0 + 1], int(sys.argv[i0 + 2]),
                            float(sys.argv[i0 + 3]))
    else:
        sys.exit(_supervise())
