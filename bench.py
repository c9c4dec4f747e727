"""
Benchmark: waveform -> log-Mel -> x-vector forward, utterances/sec/chip,
plus feature-extraction real-time factor (RTFx).

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is feature-RTFx / 10000: the reference publishes no benchmark
numbers (BASELINE.md — "published": {}), so the denominator is 1000x the
BASELINE.json north-star target of >= 10x real-time feature extraction per
chip; vs_baseline > 1 means four orders of magnitude past the reference
target.

Runs on whatever JAX platform the ambient environment provides (the real
TPU chip under the driver; CPU if forced).
"""
import json
import sys
import time
from functools import partial

import numpy as np

SAMPLE_RATE = 16000
SECONDS = 3.0
BATCH = 256
MODEL_BATCH = 32
NUM_MEL = 64
NUM_LANGS = 8


def log(*args):
    print(*args, file=sys.stderr, flush=True)


# The ONE final JSON line, emitted exactly once: by main() on a normal
# finish, or by the hard-deadline watchdog when a device call wedges
# (observed: >25 min futex spin inside a long-audio compile on the pooled
# tunnel — the soft deadline only checks the clock BETWEEN calls, so a
# stall inside one call would otherwise cost the whole run's receipt).
_FINAL = {"payload": None, "emitted": False}


def _emit_final():
    if _FINAL["emitted"] or _FINAL["payload"] is None:
        return
    _FINAL["emitted"] = True
    print(json.dumps(_FINAL["payload"]), flush=True)


def _time(step_fn, carry0, n1=10, n2=60, reps=7):
    """Per-call seconds of ``carry = step_fn(carry)``.

    Measurement notes for the axon-tunneled TPU: dispatch is fully async
    and ``block_until_ready`` returns before remote execution completes, so
    (a) each call is chained through a scalar carry to force sequential
    execution on device, (b) completion is observed by reading one scalar
    back to the host, (c) the tunnel round-trip (30-300 ms) is cancelled by
    delta timing two runs of different lengths:
    per-call = (T(n2) - T(n1)) / (n2 - n1), and (d) tunnel stalls and
    chip contention only ever ADD time, so each leg's stall-free time is
    estimated as the MINIMUM over ``reps`` independent runs — min-per-leg
    delta timing. (Pairing each t1 with its own t2 and taking the median
    was measurably worse: a stall landing in a short run inflates t1 and
    produces impossibly low, even negative, deltas.)
    """
    import numpy as np

    def run(iters):
        carry = carry0
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = step_fn(carry)
        np.asarray(carry)  # host readback forces completion
        return time.perf_counter() - t0

    run(2)  # warmup / compile
    t1s, t2s = [], []
    for _ in range(reps):  # interleave legs so load drift hits both equally
        t1s.append(run(n1))
        t2s.append(run(n2))
    return max((min(t2s) - min(t1s)) / (n2 - n1), 1e-9)


def main():
    import os
    import jax
    # Soft deadline guarding the driver's single bench run against tunnel
    # stalls (observed: 20-minute pre-dispatch hangs on the pooled link):
    # once the headline sections are measured, every later section first
    # checks the clock and is skipped — with a log line — rather than
    # risking the whole run producing no JSON at all.
    t_start = time.perf_counter()
    deadline = float(os.environ.get("LIDBOX_BENCH_DEADLINE_S", 2700))

    def past_deadline(section):
        if time.perf_counter() - t_start > deadline:
            log(f"  {section}: SKIPPED (past {deadline:.0f}s soft deadline; "
                f"set LIDBOX_BENCH_DEADLINE_S to raise)")
            return True
        return False
    try:  # persistent compile cache: re-runs skip the ~20-40 s compiles
        cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception as e:
        log(f"compilation cache unavailable: {type(e).__name__}: {e}")
    import jax.numpy as jnp
    import lidbox_tpu.features as F
    import lidbox_tpu.models as models

    dev = jax.devices()[0]
    log(f"benchmarking on {dev} ({jax.default_backend()})")
    rng = np.random.default_rng(0)
    samples = int(SAMPLE_RATE * SECONDS)

    # --- feature extraction RTFx (waveform -> log-Mel), big batch ---------
    signals = jnp.asarray(rng.normal(0, 0.1, (BATCH, samples)).astype(np.float32))

    results = {}
    for method, precision in (("matmul", "highest"), ("pallas", "highest"),
                              ("fft", "highest"), ("matmul", "bf16_3x"),
                              ("matmul", "bf16")):
        @jax.jit
        def feat_step(carry, m=method, p=precision):
            feats = F.extract_features(
                signals + carry * 1e-20, SAMPLE_RATE,
                feature_type="logmelspectrogram",
                melspectrogram={"num_mel_bins": NUM_MEL}, stft_method=m,
                precision=p)
            return jnp.mean(feats)  # scalar carry chains the next call
        try:
            dt = _time(feat_step, jnp.float32(0.0))
            rtfx = BATCH * SECONDS / dt
            results[(method, precision)] = rtfx
            log(f"  features[{method},{precision}]: {dt * 1e3:.3f} "
                f"ms/batch{BATCH} -> RTFx {rtfx:,.0f}")
        except Exception as e:
            log(f"  features[{method},{precision}] failed: "
                f"{type(e).__name__}: {e}")
    # On-chip numerics of the reduced-pass modes vs the 6-pass parity mode
    # (f64 ground truth is unavailable on device; "highest" is within
    # ~1.1e-4 of it, so diffs against it bound the true error). Signals MUST
    # be a jit argument: closed-over arrays are constants and XLA
    # constant-folds the whole feature chain at full precision on the host,
    # reporting an impossible zero error for every mode.
    try:
        @partial(jax.jit, static_argnames="p")
        def _logmel_at(x, p):
            return F.extract_features(
                x, SAMPLE_RATE, feature_type="logmelspectrogram",
                melspectrogram={"num_mel_bins": NUM_MEL},
                stft_method="matmul", precision=p)
        ref_lm = np.asarray(_logmel_at(signals[:32], "highest"))
        for p in ("bf16_3x", "bf16"):
            d = np.abs(np.asarray(_logmel_at(signals[:32], p)) - ref_lm)
            log(f"  logmel-error[{p} vs highest]: max {d.max():.2e} "
                f"mean {d.mean():.2e} p99 {np.quantile(d, 0.99):.2e}")
    except Exception as e:
        log(f"  logmel-error section failed: {type(e).__name__}: {e}")
    # Headline RTFx stays f32-parity-grade (1e-4 vs tf.signal); the bf16_3x
    # training-precision line is reported above for the speed-of-light view.
    parity = {k: v for k, v in results.items() if k[1] == "highest"}
    if parity:
        rtfx = max(parity.values())
        best_method = max(parity, key=parity.get)[0]
    else:
        # every parity-mode feature bench failed (e.g. a chip-allocation
        # error hitting all variants) — the run must still emit its ONE
        # JSON line, degraded, rather than crash with no output
        log("  ALL parity-mode feature benches failed; emitting degraded "
            "metrics")
        rtfx = 0.0  # NaN would make the final line invalid JSON
        best_method = "matmul"  # valid dispatcher value for later sections

    # --- end-to-end: waveform -> log-Mel -> x-vector forward --------------
    frames = 1 + (samples - 400) // 160
    model = models.create("xvector", (frames, NUM_MEL), NUM_LANGS)
    model.init(jax.random.PRNGKey(0))
    variables = model.variables

    model_signals = signals[:MODEL_BATCH]

    def make_e2e_step(compute_dtype):
        @jax.jit
        def e2e_step(carry):
            feats = F.extract_features(model_signals + carry * 1e-20,
                                       SAMPLE_RATE,
                                       feature_type="logmelspectrogram",
                                       melspectrogram={"num_mel_bins": NUM_MEL},
                                       stft_method=best_method)
            out = model.apply(variables, feats, train=False,
                              compute_dtype=compute_dtype)
            return jnp.mean(out)
        return e2e_step

    dt_bf16 = _time(make_e2e_step(jnp.bfloat16), jnp.float32(0.0))
    log(f"  e2e[b{MODEL_BATCH}, bf16 model]: {dt_bf16 * 1e3:.3f} ms/batch "
        f"-> {MODEL_BATCH / dt_bf16:,.1f} utt/s")
    dt = _time(make_e2e_step(None), jnp.float32(0.0))
    utt_per_sec = MODEL_BATCH / max(dt, 1e-9)
    if dt_bf16 < dt:
        dt, utt_per_sec = dt_bf16, MODEL_BATCH / dt_bf16
    log(f"  e2e[b{MODEL_BATCH}, {SECONDS}s, {best_method}]: {dt * 1e3:.3f} ms/batch "
        f"-> {utt_per_sec:,.1f} utt/s ({utt_per_sec * SECONDS:,.0f}x realtime)")

    # headline measured: arm the hard-deadline watchdog. A daemon thread
    # keeps running while the main thread is wedged inside a blocked
    # transport call, so even a mid-call tunnel hang cannot cost the
    # driver this run's JSON line — later sections' log lines are lost,
    # the receipt is not.
    _FINAL["payload"] = {
        "metric": f"utterances/sec/chip waveform->logMel->xvector "
                  f"(b{MODEL_BATCH}, {SECONDS:.0f}s utts, {best_method} STFT)",
        "value": round(utt_per_sec, 2),
        "unit": "utt/s",
        "vs_baseline": round(rtfx / 10000.0, 3),
    }
    import threading

    def _watchdog(hard=deadline + 600.0):
        while not _FINAL["emitted"]:
            if time.perf_counter() - t_start > hard:
                log(f"  HARD deadline ({hard:.0f}s): a device call appears "
                    f"wedged; emitting the measured headline and exiting")
                _emit_final()
                import os as _os
                _os._exit(0)
            time.sleep(15)
    threading.Thread(target=_watchdog, daemon=True).start()

    # saturation inference sweep: 1-pass bf16-stored DSP + bf16 model at
    # b512/b1024/b2048 — shows where serving throughput flattens (VERDICT
    # r3 next-step #5; the headline e2e above stays f32-parity-graded
    # features). n1/n2 shrink with batch so each line costs similar wall.
    # Only the b512 point runs here; the b1024/b2048 tail is DEFERRED to
    # after the fed/cached receipt sections — on a degraded tunnel window
    # its big compiles must not eat the deadline the receipts need.
    sat_state = {"prev": None}

    def run_saturation(points):
        try:
            for mult, (n1, n2) in points:
                sat_signals = jnp.concatenate([signals] * mult)
                sat_b = sat_signals.shape[0]

                # signals enter as a RUNTIME argument, not a closure
                # constant: a captured device array is baked into the
                # compile payload, and at b2048 (393 MB) the remote-compile
                # request exceeds the tunnel's size limit (HTTP 413)
                @jax.jit
                def e2e_sat(carry, s):
                    feats = F.extract_features(
                        s + carry * 1e-20, SAMPLE_RATE,
                        feature_type="logmelspectrogram",
                        melspectrogram={"num_mel_bins": NUM_MEL},
                        stft_method=best_method, precision="bf16")
                    out = model.apply(variables, feats, train=False,
                                      compute_dtype=jnp.bfloat16)
                    return jnp.mean(out)
                dt_sat = _time(lambda c: e2e_sat(c, sat_signals),
                               jnp.float32(0.0), n1=n1, n2=n2)
                rate = sat_b / dt_sat
                vs = (f", {rate / sat_state['prev']:.2f}x the previous batch"
                      if sat_state["prev"] else "")
                log(f"  e2e-saturation[b{sat_b}, bf16 DSP+model]: "
                    f"{dt_sat * 1e3:.3f} ms/batch -> {rate:,.1f} utt/s "
                    f"({rate * SECONDS:,.0f}x realtime{vs})")
                sat_state["prev"] = rate
                if past_deadline("saturation sweep tail"):
                    break
        except Exception as e:
            log(f"  e2e-saturation failed: {type(e).__name__}: {e}")

    run_saturation([(2, (5, 25))])

    # --- x-vector training step (features + fwd + bwd + adam) -------------
    import optax
    from lidbox_tpu.losses import nll_loss
    from lidbox_tpu.train.loop import Trainer
    trainer = Trainer(model, optax.adam(1e-3), nll_loss)
    trainer.create_state()
    targets = jnp.asarray(rng.integers(0, NUM_LANGS, MODEL_BATCH).astype(np.int32))

    @jax.jit
    def train_step(state, carry):
        feats = F.extract_features(model_signals + carry * 1e-20, SAMPLE_RATE,
                                   feature_type="logmelspectrogram",
                                   melspectrogram={"num_mel_bins": NUM_MEL},
                                   stft_method=best_method)
        new_state, loss = trainer._train_step(
            state, {"input": feats, "target": targets}, trainer.rng)
        return new_state, loss

    state = trainer.state
    def step_with_state(carry):
        nonlocal state
        state, loss = train_step(state, carry)
        return loss
    dt_train = _time(step_with_state, jnp.float32(0.0))
    log(f"  train-step[b{MODEL_BATCH}]: {dt_train * 1e3:.3f} ms "
        f"-> {MODEL_BATCH / dt_train:,.1f} utt/s trained")

    # saturation-scale training throughput (full b256 feature batch)
    targets256 = jnp.asarray(rng.integers(0, NUM_LANGS, BATCH).astype(np.int32))

    @jax.jit
    def train_step256(state, carry):
        feats = F.extract_features(signals + carry * 1e-20, SAMPLE_RATE,
                                   feature_type="logmelspectrogram",
                                   melspectrogram={"num_mel_bins": NUM_MEL},
                                   stft_method=best_method)
        return trainer._train_step(
            state, {"input": feats, "target": targets256}, trainer.rng)

    state256 = trainer.state

    def step256_with_state(carry):
        nonlocal state256
        state256, loss = train_step256(state256, carry)
        return loss
    dt256 = _time(step256_with_state, jnp.float32(0.0), n1=5, n2=25)
    log(f"  train-step[b{BATCH}]: {dt256 * 1e3:.3f} ms "
        f"-> {BATCH / dt256:,.1f} utt/s trained")
    # Non-movable yardstick: model FLOP utilization of the full train step
    # (features + fwd + bwd + adam) against the v5e bf16 peak. XLA counts
    # logical flops, so f32-HIGHEST matmuls (6 bf16 passes each) understate
    # hardware utilization — this is the conservative standard MFU.
    try:
        compiled = train_step.lower(state, jnp.float32(0.0)).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
        peak = 197e12  # TPU v5e bf16 peak FLOP/s
        if flops > 0:
            log(f"  train-step MFU: {100 * flops / dt_train / peak:.1f}% "
                f"({flops / 1e9:.2f} GFLOP/step vs {peak / 1e12:.0f} "
                f"TFLOP/s bf16 peak)")
    except Exception as e:
        log(f"  MFU estimate unavailable: {type(e).__name__}: {e}")

    # --- mixed-precision train step: bf16 model compute + bf16_3x DSP ----
    # The configuration a throughput-hungry user actually runs: master
    # params/opt/loss stay f32, forwards in bfloat16, DSP matmuls in the
    # 3-pass bf16 mode (~1.5e-3 log-mel error, training-grade).
    try:
        if past_deadline("bf16 train-step section"):
            raise TimeoutError("soft deadline")
        trainer_bf16 = Trainer(model, optax.adam(1e-3), nll_loss,
                               compute_dtype=jnp.bfloat16)
        trainer_bf16.create_state()
        peak = 197e12  # TPU v5e bf16 peak FLOP/s

        def bf16_line(bsig, btgt, n1, n2, dsp="bf16_3x"):
            # donate the state like the real Trainer step does: in-place
            # param updates halve the optimizer-state HBM traffic
            def step_fn(state, carry):
                feats = F.extract_features(
                    bsig + carry * 1e-20, SAMPLE_RATE,
                    feature_type="logmelspectrogram",
                    melspectrogram={"num_mel_bins": NUM_MEL},
                    stft_method=best_method, precision=dsp)
                return trainer_bf16._train_step(
                    state, {"input": feats, "target": btgt},
                    trainer_bf16.rng)
            step = jax.jit(step_fn, donate_argnums=0)
            # fresh state copy per line: donation deletes the input buffers
            state0 = jax.tree_util.tree_map(jnp.array, trainer_bf16.state)
            flops = 0.0
            try:
                ca = step.lower(state0,
                                jnp.float32(0.0)).compile().cost_analysis()
                ca = ca[0] if isinstance(ca, (list, tuple)) else ca
                flops = float(ca.get("flops", 0.0))
            except Exception:
                pass
            st = {"s": state0}

            def run(carry):
                st["s"], loss = step(st["s"], carry)
                return loss
            dt_b = _time(run, jnp.float32(0.0), n1=n1, n2=n2)
            b = bsig.shape[0]
            mfu = 100 * flops / dt_b / peak if flops else float("nan")
            roofline_ms = flops / peak * 1e3
            log(f"  train-step[bf16+{dsp}, b{b}]: {dt_b * 1e3:.3f} ms -> "
                f"{b / dt_b:,.1f} utt/s; MFU {mfu:.1f}% "
                f"({flops / 1e9:.2f} GFLOP, roofline {roofline_ms:.3f} ms)")
            return dt_b
        bf16_line(model_signals, targets, 10, 60)
        bf16_line(signals, targets256, 5, 25)
        # one-pass DSP: the throughput ceiling (max log-mel err ~1e-2,
        # for augmented-training pipelines where SpecAugment noise
        # dominates; see DSP_PRECISIONS)
        bf16_line(signals, targets256, 5, 25, dsp="bf16")
        # b512 is the measured MFU peak on v5e (63% vs 61% at b256 and
        # 58% at b1024 — larger batches start paying HBM pressure)
        bf16_line(jnp.concatenate([signals, signals]),
                  jnp.concatenate([targets256, targets256]), 4, 16)
        bf16_line(jnp.concatenate([signals, signals]),
                  jnp.concatenate([targets256, targets256]), 4, 16,
                  dsp="bf16")
    except Exception as e:
        if not isinstance(e, TimeoutError):  # deadline skips already logged
            log(f"  bf16 train-step section failed: {type(e).__name__}: {e}")

    # --- BASELINE config 5: augmented train step (VAD-free path:
    # noise bank mix + FIR + SpecAugment + log-Mel + xvector fwd/bwd) -----
    from lidbox_tpu.data import on_device
    if not past_deadline("augmented/config5 sections"):
        bank = jnp.asarray(
            rng.normal(0, 0.2, (16, SAMPLE_RATE * 4)).astype(np.float32))
        bank_len = jnp.full((16,), SAMPLE_RATE * 4, jnp.int32)
        feature_fn = on_device.make_augmented_feature_fn(
            SAMPLE_RATE, {"type": "logmelspectrogram",
                          "melspectrogram": {"num_mel_bins": NUM_MEL},
                          "stft_method": best_method},
            on_device.AugmentConfig(snr_range=(5.0, 20.0), fir_coefs=10,
                                    specaug_time_masks=2,
                                    specaug_freq_masks=2),
            noise_bank=bank, noise_lengths=bank_len)
        fused = on_device.make_fused_train_step(trainer, feature_fn)
        state2 = trainer.state

        def fused_with_state(carry):
            nonlocal state2
            state2, loss = fused(state2, model_signals + carry * 1e-20,
                                 targets, jax.random.PRNGKey(0))
            return loss
        dt_aug = _time(fused_with_state, jnp.float32(0.0))
        log(f"  augmented-train-step[b{MODEL_BATCH}]: {dt_aug * 1e3:.3f} ms "
            f"-> {MODEL_BATCH / dt_aug:,.1f} utt/s "
            f"(noise+FIR+SpecAugment fused)")

        # Full BASELINE config-5 chain: waveform -> energy VAD -> noise +
        # random resampling + SpecAugment -> log-Mel -> train, ONE XLA
        # program with the frame mask threaded into the model.
        feature_fn5 = on_device.make_augmented_feature_fn(
            SAMPLE_RATE, {"type": "logmelspectrogram",
                          "melspectrogram": {"num_mel_bins": NUM_MEL},
                          "stft_method": best_method},
            on_device.AugmentConfig(snr_range=(5.0, 20.0), fir_coefs=10,
                                    speed_range=(0.9, 1.1), vad=True,
                                    vad_min_non_speech_ms=0,
                                    specaug_time_masks=2,
                                    specaug_freq_masks=2),
            noise_bank=bank, noise_lengths=bank_len)
        fused5 = on_device.make_fused_train_step(trainer, feature_fn5)
        state5 = trainer.state

        def fused5_with_state(carry):
            nonlocal state5
            state5, loss = fused5(state5, model_signals + carry * 1e-20,
                                  targets, jax.random.PRNGKey(0))
            return loss
        dt5 = _time(fused5_with_state, jnp.float32(0.0))
        log(f"  config5-train-step[b{MODEL_BATCH}]: {dt5 * 1e3:.3f} ms "
            f"-> {MODEL_BATCH / dt5:,.1f} utt/s "
            f"(VAD+noise+resample+FIR+SpecAugment+mask fused)")

    # --- host loader: wav-decode throughput + fed train step --------------
    # SURVEY §7 "feature extraction never bottlenecks training": decode
    # utt/s (native C++ vs pure Python, 1..4 threads) and a decode->
    # featurize->stage->train loop compared against the device-resident
    # train step. NOTE: host->device transfers here ride the axon tunnel
    # (30-300 ms RTT); on a real TPU host the fed gap would be smaller.
    try:
        if past_deadline("host-loader section"):
            raise TimeoutError("soft deadline")
        import os
        import tempfile
        import wave
        from concurrent.futures import ThreadPoolExecutor
        from lidbox_tpu.data.device_pipeline import DeviceFeatureExtractor
        from lidbox_tpu.features import io as audio_io

        corpus = tempfile.mkdtemp(prefix="lidbox_bench_")
        n_files = 64
        paths = []
        for i in range(n_files):
            sig = rng.normal(0, 0.1, samples).astype(np.float32)
            p = os.path.join(corpus, f"u{i}.wav")
            audio_io.write_mono_wav(p, sig, SAMPLE_RATE)
            paths.append(p)

        def py_read(path):  # pure-Python baseline decoder
            with wave.open(str(path), "rb") as f:
                rate = f.getframerate()
                raw = f.readframes(f.getnframes())
            return np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0, rate

        def decode_rate(read_fn, workers, reps=6):
            with ThreadPoolExecutor(workers) as pool:
                list(pool.map(read_fn, paths))  # warm the page cache
                t0 = time.perf_counter()
                for _ in range(reps):
                    list(pool.map(read_fn, paths))
                return n_files * reps / (time.perf_counter() - t0)

        for name, fn in (("native", audio_io.read_wav), ("python", py_read)):
            rates = {w: decode_rate(fn, w) for w in (1, 2, 4)}
            log(f"  loader decode[{name}]: "
                + "  ".join(f"{w}thr {r:,.0f} utt/s" for w, r in rates.items()))

        # GIL-release check: thread SCALING cannot be shown on this 1-core
        # host (and a counter-thread probe can't discriminate either —
        # the 5 ms GIL switch interval shares the core regardless). The
        # property IS checkable structurally: ctypes releases the GIL
        # during every foreign call made through CDLL (only PyDLL holds
        # it, by CPython specification), so decode parallelism follows
        # from the binding kind.
        import ctypes
        from lidbox_tpu import native as native_mod
        lib = native_mod.load_library()
        if lib is not None:
            kind = type(lib).__name__
            gil_free = isinstance(lib, ctypes.CDLL) and not isinstance(
                lib, ctypes.PyDLL)
            log(f"  loader binding: {kind} -> decode calls "
                f"{'RELEASE' if gil_free else 'HOLD'} the GIL "
                f"(scaling demonstrable only on multi-core hosts)")

        # ---- decomposition of the fed-training pipeline (VERDICT r2 #1):
        # (a) loader-only rate, (b) host->device transfer cost serial vs
        # pipelined, (c) the fed fused train step, (d) the same program
        # device-resident — so the gap is attributed, not just observed.
        def read_wav_int16(path):  # loader-native PCM: no float conversion
            with wave.open(str(path), "rb") as f:
                raw = f.readframes(f.getnframes())
            return np.frombuffer(raw, "<i2")

        num_batches = 24

        def int16_batches(num):
            for b0 in range(num):
                batch_paths = [paths[(b0 * MODEL_BATCH + j) % n_files]
                               for j in range(MODEL_BATCH)]
                sigs = np.stack([read_wav_int16(p) for p in batch_paths])
                yield sigs, np.asarray(targets)

        # (a) loader only: decode + batch assembly, device never touched
        t0 = time.perf_counter()
        for _ in int16_batches(num_batches):
            pass
        loader_rate = num_batches * MODEL_BATCH / (time.perf_counter() - t0)
        log(f"  loader-only[b{MODEL_BATCH} int16]: {loader_rate:,.0f} utt/s "
            f"(decode+assemble, no device)")

        # (b) transfer cost of one staged waveform batch (int16 = half the
        # f32 bytes). Serial = RTT + bandwidth per batch; pipelined-8 =
        # effective per-batch cost with 8 transfers in flight from 4
        # threads (the Trainer._staged feed geometry).
        peek = jax.jit(lambda a: a.ravel()[0].astype(jnp.float32))
        one_batch = next(int16_batches(1))[0]
        batch_mb = one_batch.nbytes / 1e6
        distinct = [one_batch + np.int16(i) for i in range(16)]
        np.asarray(peek(jax.device_put(distinct[0])))  # warm compile
        serial = []
        for i in range(6):
            t0 = time.perf_counter()
            np.asarray(peek(jax.device_put(distinct[i % len(distinct)])))
            serial.append(time.perf_counter() - t0)
        t_serial = min(serial)
        # steady-state (streamed) cost: transfers serialize on this link,
        # so the pipeline's per-batch cost is the back-to-back transfer
        # time WITHOUT a readback round trip per batch — measure K puts
        # with one completion readback at the end (in-order completion)
        def measure_stream(bufs=None):
            bufs = distinct if bufs is None else bufs
            t0 = time.perf_counter()
            put_all = [jax.device_put(b) for b in bufs]
            np.asarray(peek(put_all[-1]))
            return (time.perf_counter() - t0) / len(bufs)
        t_stream = measure_stream()
        transfer_rate = MODEL_BATCH / t_stream
        log(f"  transfer[b{MODEL_BATCH} int16 {batch_mb:.1f}MB]: serial+ack "
            f"{t_serial * 1e3:.1f} ms, streamed {t_stream * 1e3:.1f} "
            f"ms/batch -> ceiling {transfer_rate:,.0f} utt/s "
            f"({batch_mb / t_stream:.0f} MB/s)")

        # (c)+(d) fed fused training vs the same program device-resident.
        # ONE h2d per step (int16 waveforms), featurize+train in one XLA
        # program, 8 staged batches in flight.
        from lidbox_tpu.data import on_device
        clean_fn = on_device.make_augmented_feature_fn(
            SAMPLE_RATE, {"type": "logmelspectrogram",
                          "melspectrogram": {"num_mel_bins": NUM_MEL},
                          "stft_method": best_method},
            on_device.AugmentConfig())
        trainer_fed = Trainer(model, optax.adam(1e-3), nll_loss,
                              stage_dtype="int16", prefetch=8)
        fused_clean = on_device.make_fused_train_step(trainer_fed, clean_fn)
        trainer_fed.create_state()

        dev_sigs = jax.device_put(distinct[0])
        dev_tgts = jax.device_put(np.asarray(targets))
        stt = {"s": trainer_fed.state}

        def dev_resident(carry):
            stt["s"], loss = fused_clean(stt["s"], dev_sigs, dev_tgts,
                                         trainer_fed.rng)
            return loss
        dt_dev = _time(dev_resident, jnp.float32(0.0))
        device_rate = MODEL_BATCH / dt_dev

        # every fit_signals() call carries a fixed cost (end-of-fit param
        # sync, loss readback, pipeline fill/drain) that a 24-batch
        # receipt epoch cannot amortize — delta-time two epoch lengths
        # (like the feature-fed lines) so the steady-state rate and the
        # fixed per-fit cost report separately. Transfer probes match
        # the actual geometry: spd=4 ships ONE stacked put per round.
        sig_probe_bufs = {1: distinct,
                          4: [np.stack(distinct[i:i + 4])
                              for i in range(0, len(distinct), 4)]}
        for spd in (1, 4):
            nb_short, nb_long = num_batches, 3 * num_batches
            on_device.fit_signals(trainer_fed, clean_fn,
                                  lambda: int16_batches(2 * spd), epochs=1,
                                  verbose=False,
                                  steps_per_dispatch=spd)  # warm compiles
            # the pooled link's rate drifts minute to minute: bound each
            # fed line with a streamed-transfer measurement taken
            # IMMEDIATELY around it (in-process A/B)
            probes = [measure_stream(sig_probe_bufs[spd])]
            flegs = {nb_short: [], nb_long: []}
            for _ in range(2):  # min per leg: stalls only ever add time
                for nb in (nb_short, nb_long):
                    t0 = time.perf_counter()
                    on_device.fit_signals(trainer_fed, clean_fn,
                                          lambda n=nb: int16_batches(n),
                                          epochs=1, verbose=False,
                                          steps_per_dispatch=spd)
                    flegs[nb].append(time.perf_counter() - t0)
                probes.append(measure_stream(sig_probe_bufs[spd]))
            steady = ((min(flegs[nb_long]) - min(flegs[nb_short]))
                      / (nb_long - nb_short))
            fixed = max(min(flegs[nb_short]) - nb_short * steady, 0.0)
            fed_rate = MODEL_BATCH / max(steady, 1e-9)
            # min over interleaved probes: the fit legs are min-over-reps
            # stall-free estimates, so the bound must be one too
            xfer_now = spd * MODEL_BATCH / min(probes)
            bound = min(loader_rate, xfer_now, device_rate)
            limiter = {loader_rate: "loader", xfer_now: "transfer",
                       device_rate: "device"}[bound]
            log(f"  fed-train-fused[b{MODEL_BATCH} int16, {spd} step/"
                f"dispatch]: steady-state {fed_rate:,.1f} utt/s (decode->"
                f"stage->featurize+train) vs {device_rate:,.1f} "
                f"device-resident; bound min(loader {loader_rate:,.0f}, "
                f"transfer {xfer_now:,.0f}, device {device_rate:,.0f}) = "
                f"{bound:,.0f} [{limiter}-bound] -> achieved "
                f"{100 * fed_rate / bound:.0f}% of bound; "
                f"+{fixed * 1e3:,.0f} ms fixed per fit")

        # device-resident epoch cache: epoch 1 pays the feed once, later
        # epochs train from HBM at device speed (augmentation stays fresh
        # — it runs on device from the cached raw waveforms)
        if past_deadline("fed-cached section"):
            raise TimeoutError("soft deadline")
        from lidbox_tpu.train.loop import Callback
        epoch_walls = []

        class _EpochTimer(Callback):
            def on_epoch_begin(self, t, e):
                epoch_walls.append([time.perf_counter()])

            def on_epoch_end(self, t, e, logs):
                epoch_walls[-1].append(time.perf_counter())
        trainer_fed.callbacks.append(_EpochTimer())
        try:
            # steps_per_dispatch amortizes the per-step tunnel dispatch on
            # the cached replay epochs (one lax.scan program per 4 cached
            # batches) — without it the replay is dispatch-latency-bound
            # (measured 22% of the device rate; ~3.8 ms/step of tunnel
            # dispatch against a 1.1 ms device step)
            on_device.fit_signals(trainer_fed, clean_fn,
                                  lambda: int16_batches(num_batches),
                                  epochs=3, verbose=False, cache_staged=True,
                                  steps_per_dispatch=4)
        finally:
            trainer_fed.callbacks.pop()
        rates = [num_batches * MODEL_BATCH / (b - a) for a, b in epoch_walls]
        # replay floor (VERDICT r4 #3): a cached replay epoch cannot beat
        # one dispatch->readback round trip plus num_batches device steps.
        # On a 24-batch receipt corpus that floor — not device headroom —
        # sets the ceiling: "% of device rate" alone under-reports small
        # corpora, so print the floor and the achieved fraction OF IT.
        # t_rtt: a no-op program on device-resident args, dispatched and
        # read back, min over reps (stalls only ever add time).
        rtts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(peek(dev_sigs))
            rtts.append(time.perf_counter() - t0)
        t_rtt = min(rtts)
        floor_wall = t_rtt + num_batches * dt_dev
        floor_rate = num_batches * MODEL_BATCH / floor_wall
        log(f"  fed-cached[b{MODEL_BATCH} int16, 3 epochs, 4 step/"
            f"dispatch]: epoch1 "
            f"{rates[0]:,.0f} -> epoch3 {rates[-1]:,.0f} utt/s "
            f"(device-resident cache; {100 * rates[-1] / device_rate:.0f}% "
            f"of device rate after the one-time feed); conservative epoch "
            f"floor = 1 round trip {t_rtt * 1e3:.0f} ms + {num_batches} x "
            f"{dt_dev * 1e3:.2f} ms dispatched-step time = "
            f"{floor_rate:,.0f} utt/s -> epoch3 at "
            f"{100 * rates[-1] / floor_rate:.0f}% of it (>=100% means the "
            f"scan beat dispatched stepping — per-step dispatch is inside "
            f"the floor's step term but amortized by the replay scan)")

        # legacy r02-style fed path (host featurize round-trip, f32
        # features staged) for direct comparison with BENCH_r02's 114 utt/s
        if past_deadline("legacy fed section"):
            raise TimeoutError("soft deadline")
        extractor = DeviceFeatureExtractor(
            {"type": "logmelspectrogram",
             "melspectrogram": {"num_mel_bins": NUM_MEL},
             "stft_method": best_method})
        decode_pool = ThreadPoolExecutor(4)

        def fed_batches(num):
            for b0 in range(num):
                batch_paths = [paths[(b0 * MODEL_BATCH + j) % n_files]
                               for j in range(MODEL_BATCH)]
                sigs = [s for s, _ in decode_pool.map(audio_io.read_wav,
                                                      batch_paths)]
                feats = extractor(np.stack(sigs), SAMPLE_RATE)
                yield {"input": feats, "target": np.asarray(targets)}

        state3 = trainer.state
        loss3 = None
        list(fed_batches(2))  # warm compile path
        # producer-only rate, probed in the SAME window (VERDICT r4 weak
        # #1's unexplained 63-vs-114 line): fed_batches featurizes through
        # a device ROUND TRIP per batch — ~8.5 MB of extra traffic on the
        # same serializing link — so the producer, not the training feed,
        # bounds this legacy line; its rate drifts with the pooled link
        # like everything else, which is the r02 114 vs r04 63 story.
        t0 = time.perf_counter()
        for _ in fed_batches(12):
            pass
        producer_rate = 12 * MODEL_BATCH / (time.perf_counter() - t0)
        t0 = time.perf_counter()
        for _, batch in trainer._staged(fed_batches(num_batches)):
            state3, loss3 = trainer._jit_train_step(state3, batch, trainer.rng)
        np.asarray(jax.device_get(loss3))
        fed_legacy = num_batches * MODEL_BATCH / (time.perf_counter() - t0)
        log(f"  fed-train-step[b{MODEL_BATCH} f32 features, pipelined "
            f"staging]: {fed_legacy:,.1f} utt/s vs producer-only "
            f"{producer_rate:,.1f} utt/s (in-situ featurize round trip "
            f"bounds this line; r02's 114 was a different link window)")

        # grouped dispatch on the FEATURE-fed path (VERDICT r3 #2):
        # Trainer.fit(steps_per_dispatch=K) stacks K bf16-staged feature
        # batches per transfer + one scanned program, the same K-fold
        # round amortization the fused line gets. The batches are
        # PRECOMPUTED (host-resident) so the line measures the FEED
        # machinery: the in-situ producer above (fed_batches) featurizes
        # through a device round trip — ~8.5 MB of extra tunnel traffic
        # per batch sharing the same serializing link — and that producer
        # cost is the legacy line's story, not this receipt's. Bound =
        # min(streamed bf16-feature transfer probed immediately around
        # each run, device-resident feature train step).
        if past_deadline("feature grouped-dispatch section"):
            raise TimeoutError("soft deadline")
        trainer_feat = Trainer(model, optax.adam(1e-3), nll_loss,
                               stage_dtype="bfloat16", prefetch=8)
        trainer_feat.create_state()
        feat_host = list(fed_batches(num_batches))  # precompute ONCE
        # streamed-transfer probe over the dominant array (the bf16
        # feature tensor; the int32 targets are noise at this size)
        feat_input0 = np.asarray(feat_host[0]["input"]).astype(jnp.bfloat16)
        feat_bufs = [feat_input0 + np.asarray(i, feat_input0.dtype)
                     for i in range(16)]
        feat_mb = feat_bufs[0].nbytes / 1e6
        # device-resident yardstick: the same jitted train step fed from
        # HBM (bf16-staged batch already on device). The step DONATES its
        # state arg, so it runs on a copy — donating trainer_feat.state
        # itself would leave the upcoming fit() calls holding deleted
        # buffers.
        dev_fb = trainer_feat._put(feat_host[0])
        stt_f = {"s": jax.tree_util.tree_map(jnp.copy, trainer_feat.state)}

        def dev_feat_step(carry):
            stt_f["s"], loss = trainer_feat._jit_train_step(
                stt_f["s"], dev_fb, trainer_feat.rng)
            return loss
        # the pooled chip's absolute step time drifts 3-6x between
        # moments: re-probe the device yardstick IMMEDIATELY around each
        # fed run (like the transfer probe), not once up front
        def probe_device_feat_rate():
            return MODEL_BATCH / _time(dev_feat_step, jnp.float32(0.0),
                                       n1=4, n2=16, reps=3)
        device_feat_rate = probe_device_feat_rate()
        # Every fit() call carries ~0.5 s of FIXED cost on this link
        # (params->host sync at fit end — now one batched readback —
        # loss-vector readback, pipeline fill/drain); over a 24-batch
        # receipt epoch that fixed cost masqueraded as a 55-68% feed
        # residual in r04 and even made 4 steps/dispatch look slower
        # than 1 (measured attribution: tools/exp_feed_attrib.py — the
        # staged feed core itself runs at ~100% of the transfer bound).
        # Delta-time TWO fit lengths so the steady-state rate and the
        # fixed per-fit cost are reported separately.
        # transfer probes must match the ACTUAL feed geometry per spd:
        # at spd=4 the fit ships ONE [4, B, T, F] stack per dispatch
        # round, and big stacked puts move more MB/s than 4 small ones
        # (per-put overhead amortizes) — probing with unstacked buffers
        # under-states the bound and yields impossible >100% fractions
        probe_bufs = {1: feat_bufs,
                      4: [np.stack(feat_bufs[i:i + 4])
                          for i in range(0, len(feat_bufs), 4)]}
        for spd in (1, 4):
            nb_short, nb_long = num_batches, 3 * num_batches

            def feat_src(n):
                return (feat_host[i % num_batches] for i in range(n))
            trainer_feat.fit(lambda: feat_src(2 * spd), epochs=1,
                             verbose=False, steps_per_dispatch=spd)  # warm
            device_feat_rate = probe_device_feat_rate()
            probes = [measure_stream(probe_bufs[spd])]
            legs = {nb_short: [], nb_long: []}
            for _ in range(2):  # min per leg: stalls only ever add time
                for nb in (nb_short, nb_long):
                    t0 = time.perf_counter()
                    trainer_feat.fit(lambda n=nb: feat_src(n), epochs=1,
                                     verbose=False, steps_per_dispatch=spd)
                    legs[nb].append(time.perf_counter() - t0)
                probes.append(measure_stream(probe_bufs[spd]))
            steady = ((min(legs[nb_long]) - min(legs[nb_short]))
                      / (nb_long - nb_short))
            fixed = max(min(legs[nb_short]) - nb_short * steady, 0.0)
            fed_feat_rate = MODEL_BATCH / max(steady, 1e-9)
            # measure_stream prices one PUT (at spd=4 each put carries 4
            # model batches); min over interleaved probes to match the
            # fit legs' min-over-reps stall-free estimator
            xfer_now = spd * MODEL_BATCH / min(probes)
            bound = min(xfer_now, device_feat_rate)
            limiter = ("transfer" if bound == xfer_now else "device")
            log(f"  fed-train-step[features bf16 {feat_mb:.1f}MB "
                f"precomputed, {spd} step/dispatch]: steady-state "
                f"{fed_feat_rate:,.1f} utt/s vs bound min(transfer "
                f"{xfer_now:,.0f}, device {device_feat_rate:,.0f}) = "
                f"{bound:,.0f} [{limiter}-bound] -> achieved "
                f"{100 * fed_feat_rate / bound:.0f}% of bound; "
                f"+{fixed * 1e3:,.0f} ms fixed per fit() "
                f"(param sync + loss readback + pipeline fill)")

        # whole-epoch cached replay on the feature path (VERDICT r3 #3):
        # epochs 2+ run ONE scanned program per epoch over the
        # consolidated device-resident stack — dispatch count drops from
        # num_batches to 1
        if past_deadline("feature cached-replay section"):
            raise TimeoutError("soft deadline")
        feat_walls = []

        class _FeatEpochTimer(Callback):
            def on_epoch_begin(self, t, e):
                feat_walls.append([time.perf_counter()])

            def on_epoch_end(self, t, e, logs):
                feat_walls[-1].append(time.perf_counter())
        trainer_feat2 = Trainer(model, optax.adam(1e-3), nll_loss,
                                stage_dtype="bfloat16", prefetch=8,
                                callbacks=[_FeatEpochTimer()])
        trainer_feat2.fit(feat_host, epochs=3,
                          verbose=False, cache_staged=True)
        f_rates = [num_batches * MODEL_BATCH / (b - a) for a, b in feat_walls]
        # epoch floor for the whole-epoch scan (VERDICT r4 #3): one
        # dispatch->readback round trip + num_batches device steps; the
        # step time is re-probed here, in this window
        dev_feat_now = probe_device_feat_rate()
        np.asarray(peek(dev_fb["input"]))  # warm this shape's compile
        rtts = []
        for _ in range(5):  # no-op dispatch+readback on device-resident arg
            t0 = time.perf_counter()
            np.asarray(peek(dev_fb["input"]))
            rtts.append(time.perf_counter() - t0)
        t_rtt_f = min(rtts)
        f_floor_wall = t_rtt_f + num_batches * MODEL_BATCH / dev_feat_now
        f_floor_rate = num_batches * MODEL_BATCH / f_floor_wall
        log(f"  fed-cached[features bf16, 3 epochs, whole-epoch scan]: "
            f"epoch1 {f_rates[0]:,.0f} -> epoch3 {f_rates[-1]:,.0f} utt/s "
            f"(1 dispatch + 1 readback per epoch after the one-time feed); "
            f"conservative epoch floor = 1 round trip {t_rtt_f * 1e3:.0f} "
            f"ms + {num_batches} x "
            f"{MODEL_BATCH / dev_feat_now * 1e3:.2f} ms dispatched-step "
            f"time = {f_floor_rate:,.0f} utt/s -> epoch3 at "
            f"{100 * f_rates[-1] / f_floor_rate:.0f}% of it (>=100% = the "
            f"scan amortized the dispatch inside the floor's step term)")

        # embedding-extraction feed (the extract_embeddings pipeline
        # shape): per batch, host features -> device forward -> host
        # readback (np.asarray in both arms — the pipeline materializes
        # embeddings). stage_dtype=bfloat16 halves the h2d bytes (the
        # extract_embeddings config key). overlap=2 keeps two extractor
        # calls in flight (num_parallel_calls=2): the serializing tunnel
        # makes its sign WINDOW-DEPENDENT (r03 measured 0.77x, r04 1.22x),
        # so the two arms are INTERLEAVED here — 3 alternations, min per
        # leg — and the ratio is reported as this window's, not a law.
        if past_deadline("extraction-feed section"):
            raise TimeoutError("soft deadline")
        import collections
        from lidbox_tpu.util import make_batch_predict_fn
        feat_list = [np.asarray(b["input"], np.float32)
                     for b in fed_batches(12)]

        def extraction_run(efn, overlap):
            t0 = time.perf_counter()
            if overlap == 1:
                for x in feat_list:
                    np.asarray(efn(x))
            else:
                with ThreadPoolExecutor(overlap) as epool:
                    futs = collections.deque()
                    for x in feat_list:
                        futs.append(epool.submit(
                            lambda a: np.asarray(efn(a)), x))
                        while len(futs) > overlap:
                            futs.popleft().result()
                    while futs:
                        futs.popleft().result()
            return len(feat_list) * MODEL_BATCH / (time.perf_counter() - t0)

        efn_f32 = make_batch_predict_fn(model, stage_dtype=None)
        np.asarray(efn_f32(feat_list[0]))  # warm the compile
        rate_f32 = extraction_run(efn_f32, 1)
        log(f"  extraction-feed[b{MODEL_BATCH} f32 features, overlap=1]: "
            f"{rate_f32:,.1f} utt/s")
        efn_bf16 = make_batch_predict_fn(model, stage_dtype="bfloat16")
        np.asarray(efn_bf16(feat_list[0]))
        ov_rates = {1: [], 2: []}
        for _ in range(3):
            for ov in (1, 2):
                ov_rates[ov].append(extraction_run(efn_bf16, ov))
        best = {ov: max(rs) for ov, rs in ov_rates.items()}
        log(f"  extraction-feed[b{MODEL_BATCH} bf16 features, interleaved "
            f"3x]: overlap=1 {best[1]:,.1f} utt/s, overlap=2 "
            f"{best[2]:,.1f} utt/s -> overlap-2 ratio {best[2] / best[1]:.2f}x "
            f"this window (sign varies with link state; default "
            f"num_parallel_calls=1 is the conservative choice)")
        decode_pool.shutdown()
    except Exception as e:
        if not isinstance(e, TimeoutError):  # deadline skips already logged
            log(f"  host-loader section failed: {type(e).__name__}: {e}")

    # --- serving latency (VERDICT r4 #7): the bench's throughput lines are
    # saturation-only; a deployment cares about per-request latency. b1
    # single-utterance device time (waveform -> log-Mel -> scores) and the
    # streaming per-chunk device time, both delta-timed so the tunnel RTT
    # cancels; plus one wall number through StreamingClassifier.feed to
    # show what THIS tunnel adds (on-host serving pays only device time).
    try:
        if past_deadline("serving-latency section"):
            raise TimeoutError("soft deadline")
        sig1 = jnp.asarray(rng.normal(0, 0.1, (1, samples)).astype(np.float32))
        for pname, precision, cdtype in (("f32", "highest", None),
                                         ("bf16", "bf16", jnp.bfloat16)):
            @jax.jit
            def serve1_step(carry, p=precision, cd=cdtype):
                feats = F.extract_features(
                    sig1 + carry * 1e-20, SAMPLE_RATE,
                    feature_type="logmelspectrogram",
                    melspectrogram={"num_mel_bins": NUM_MEL},
                    stft_method=best_method, precision=p)
                kw = {} if cd is None else {"compute_dtype": cd}
                out = model.apply(variables, feats, train=False, **kw)
                return jnp.mean(out)
            # sub-ms op: n2 >= 200 per CLAUDE.md's timing recipe
            dt1 = _time(serve1_step, jnp.float32(0.0), n1=20, n2=220, reps=5)
            log(f"  serving-latency[b1 {SECONDS:.0f}s waveform->scores, "
                f"{pname}]: {dt1 * 1e3:.3f} ms device time "
                f"({1 / dt1:,.0f} utt/s at b1)")
        from lidbox_tpu.serve import StreamingClassifier
        sc = StreamingClassifier(model, [str(i) for i in range(NUM_LANGS)],
                                 sample_rate=SAMPLE_RATE)
        chunk_sig = jnp.asarray(rng.normal(0, 0.1, (1, sc.chunk_len))
                                .astype(np.float32))

        @jax.jit
        def chunk_step(carry):  # the streaming per-chunk program shape
            feats = F.extract_features(
                chunk_sig + carry * 1e-20, SAMPLE_RATE,
                feature_type="logmelspectrogram",
                melspectrogram={"num_mel_bins": NUM_MEL})
            out = model.apply(variables, feats, train=False)
            return jnp.mean(out)
        dt_chunk = _time(chunk_step, jnp.float32(0.0), n1=20, n2=220, reps=5)
        block = rng.normal(0, 0.1, sc.chunk_len).astype(np.float32)
        sc.feed(block)  # warm both compiles (extractor + forward)
        hop_block = rng.normal(0, 0.1, sc.hop).astype(np.float32)
        walls = []
        for _ in range(8):
            t0 = time.perf_counter()
            sc.feed(hop_block)  # completes exactly one chunk
            walls.append(time.perf_counter() - t0)
        log(f"  serving-latency[streaming {sc.chunk_len / SAMPLE_RATE:.0f}s "
            f"chunk]: {dt_chunk * 1e3:.3f} ms device time/chunk; "
            f"StreamingClassifier.feed wall {min(walls) * 1e3:.0f} ms/chunk "
            f"through the tunnel (1 synchronous round trip — the fused "
            f"chunk program; on-host serving pays only the device time)")
    except Exception as e:
        if not isinstance(e, TimeoutError):
            log(f"  serving-latency section failed: {type(e).__name__}: {e}")

    # --- model zoo: waveform -> features -> forward across families ------
    # (bf16 DSP + bf16 model, b128 x 3 s — shows the zoo is fast, not just
    # correct; the recurrent families are scan-bound by design). Runs
    # AFTER the fed/cached receipt sections: on a degraded window the
    # exploratory lines are the ones to lose to the deadline.
    if not past_deadline("model-zoo section"):
        zoo_signals = signals[:128]
        # Scan-latency roofline (VERDICT r3 next-step #5): the recurrent
        # families are bound by T sequential scan iterations, each paying
        # at least the device's per-iteration scheduling floor regardless
        # of how small the cell math is. Measure that floor with a
        # minimal-cell scan at L=2048 vs 4096 iterations (large L: at the
        # model's own T~300 the whole scan sits inside the dispatch floor
        # and the delta is below timer resolution), then report each RNN
        # model's bound = n_sequential_scans x T x floor so "scan-bound"
        # is a number next to the measured rate.
        scan_iter_floor = float("nan")
        try:
            def minimal_scan(T):
                @jax.jit
                def f(carry):
                    def body(c, _):
                        return c * 0.999 + 1e-6, None
                    c, _ = jax.lax.scan(body, carry, None, length=T)
                    return c
                return f
            L = 2048
            dt_a = _time(minimal_scan(L), jnp.float32(0.0),
                         n1=4, n2=16, reps=5)
            dt_b = _time(minimal_scan(2 * L), jnp.float32(0.0),
                         n1=4, n2=16, reps=5)
            scan_iter_floor = max((dt_b - dt_a) / L, 0.0)
            if scan_iter_floor * L < 20e-6:
                # delta below ~timer resolution: report, and drop the
                # per-model bound clause rather than printing "0% of a
                # 0 ms bound"
                log(f"  scan-iteration floor: < {20e-6 / L * 1e9:.0f} ns "
                    f"(delta {L} vs {2 * L} iters below resolution; "
                    "recurrent rates are cell-bound, not dispatch-bound)")
                scan_iter_floor = float("nan")
            else:
                log(f"  scan-iteration floor: "
                    f"{scan_iter_floor * 1e6:.2f} us "
                    f"(minimal-cell lax.scan, delta {L} vs {2 * L} iters)")
        except Exception as e:
            log(f"  scan-floor measurement failed: {type(e).__name__}: {e}")
        # sequential scan chains per model: stacked recurrent layers
        # (directions of one bidirectional layer run concurrently)
        zoo_scans = {"cnn": 0, "clstm": 1, "bi_gru": 2,
                     "multilevel_attention": 0}
        for key in ("cnn", "clstm", "bi_gru", "multilevel_attention"):
            try:
                zoo_model = models.create(key, (frames, NUM_MEL), NUM_LANGS)
                zoo_model.init(jax.random.PRNGKey(0))
                zoo_vars = zoo_model.variables

                @jax.jit
                def zoo_step(carry, m=zoo_model, v=zoo_vars):
                    feats = F.extract_features(
                        zoo_signals + carry * 1e-20, SAMPLE_RATE,
                        feature_type="logmelspectrogram",
                        melspectrogram={"num_mel_bins": NUM_MEL},
                        stft_method=best_method, precision="bf16")
                    out = m.apply(v, feats, train=False,
                                  compute_dtype=jnp.bfloat16)
                    return jnp.mean(out)
                dt_zoo = _time(zoo_step, jnp.float32(0.0), n1=4, n2=16,
                               reps=5)
                bound = ""
                n_scans = zoo_scans.get(key, 0)
                if n_scans and np.isfinite(scan_iter_floor):
                    t_bound = n_scans * frames * scan_iter_floor
                    bound = (f"; scan roofline >= {t_bound * 1e3:.3f} ms "
                             f"({n_scans} chains x {frames} iters) -> "
                             f"at {100 * t_bound / dt_zoo:.0f}% of the "
                             f"latency bound")
                log(f"  zoo-forward[{key}, b128 bf16]: {dt_zoo * 1e3:.3f} "
                    f"ms -> {128 / dt_zoo:,.1f} utt/s{bound}")
            except Exception as e:
                log(f"  zoo-forward[{key}] failed: {type(e).__name__}: {e}")

    # --- long-audio memory profile: Pallas fused kernel vs XLA gather path.
    # The XLA lowering materializes a [B, frames, 400] f32 frame tensor in
    # HBM (gather), the fused kernel streams signal rows through VMEM.
    try:
        if past_deadline("long-audio section"):
            raise TimeoutError("soft deadline")
        from lidbox_tpu.ops import fused_logmel_packed, logmel_reference
        long_secs = 60.0
        long_b = 32
        long_sig = jnp.asarray(rng.normal(
            0, 0.1, (long_b, int(SAMPLE_RATE * long_secs))).astype(np.float32))

        # raw XLA line: logmel_reference goes through the audio layer and
        # is never auto-routed; extract_features WOULD auto-route
        # matmul+bf16 long audio to the pallas kernel
        # (features/__init__._auto_pallas_bf16) — measured as its own
        # "auto-dispatch" line below.
        def auto_logmel(sig, sr, precision="bf16"):
            return F.extract_features(sig, sr,
                                      feature_type="logmelspectrogram",
                                      melspectrogram={"num_mel_bins": NUM_MEL},
                                      stft_method="matmul",
                                      precision=precision)
        # logmel_reference routes through the same shape heuristic as the
        # default path now, so the frame-tensor gather formulation (131 ms
        # here before the segment-matmul STFT) is no longer reachable at
        # this shape; compare the two surviving formulations on TIME and
        # compiled PEAK TEMP MEMORY — the Pallas kernel's raison d'etre:
        # XLA never fuses matmul->matmul, so the segment-matmul path must
        # spill the [B, frames, fft/2] power spectrogram to HBM between
        # the DFT and mel matmuls; the fused kernel streams it through
        # VMEM tiles. At "bf16" the fused kernel also WINS ON TIME (r03:
        # 3.3 vs 5.4 ms) — the XLA path is bandwidth-bound and the kernel
        # halves its traffic again.
        for name, fn, precisions in (
                ("xla-segment", logmel_reference, ("highest", "bf16")),
                ("pallas", fused_logmel_packed, ("highest", "bf16")),
                ("auto-dispatch", auto_logmel, ("bf16",))):
            for precision in precisions:
                # checked per VARIANT, not just at section entry: each
                # compile is a fresh multi-second tunnel round (one of
                # these hung >25 min in a degraded window)
                if past_deadline(f"long-audio[{name}, {precision}]"):
                    raise TimeoutError("soft deadline")

                @jax.jit
                def long_step(carry, f=fn, p=precision):
                    return jnp.mean(f(long_sig + carry * 1e-20, SAMPLE_RATE,
                                      precision=p))
                temp_mb = float("nan")
                try:
                    mem = long_step.lower(jnp.float32(0.0)).compile() \
                        .memory_analysis()
                    temp_mb = mem.temp_size_in_bytes / 1e6
                except Exception:
                    pass
                dt_long = _time(long_step, jnp.float32(0.0), n1=3, n2=9)
                log(f"  long-audio[{name}, {precision}, b{long_b} x "
                    f"{long_secs:.0f}s]: {dt_long * 1e3:.3f} ms, "
                    f"peak temp {temp_mb:,.0f} MB")
    except Exception as e:
        if not isinstance(e, TimeoutError):  # deadline skips already logged
            log(f"  long-audio section failed: {type(e).__name__}: {e}")

    # deferred saturation tail (b1024/b2048): exploratory, big compiles —
    # runs dead last so a degraded window costs these lines, not receipts
    if not past_deadline("saturation sweep tail"):
        run_saturation([(4, (4, 12)), (8, (3, 7))])

    _emit_final()


if __name__ == "__main__":
    main()
