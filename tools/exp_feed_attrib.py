"""
Feed-gap attribution on the REAL chip (VERDICT r4 weak #1): why does the
feature-fed train line reach only 45% (1 step/dispatch) / 32% (4) of the
streamed-transfer bound, when the fused signal line reaches ~100%?

Hypotheses measured here, all interleaved in ONE process (the pooled
link's absolute rate swings 3-6x between sessions; only in-process A/B
ratios are trustworthy — CLAUDE.md cost model):

  input-only      the bound probe: stream N bf16 feature tensors, one
                  completion readback at the end (bench.measure_stream).
  dict            what Trainer._put actually ships: {input, target} —
                  TWO arrays per batch; the cost model says every
                  separate array pays its own ~28 ms round trip.
  packed          ONE array per batch: targets bitcast into one extra
                  feature row (the feature-path analogue of the fused
                  path's pack_targets_int16, on_device.py:413-431).
  stack4          the _put_group geometry: K=4 batches as one
                  [4, B, T, F] stack + one [4, B] target stack.
  stack4-packed   the stack with targets packed into each step's extra
                  row (one array per 4 steps).
  fit-spd1/4      the actual Trainer.fit lines from bench.py, to
                  reproduce the 45%/32% next to the probes.
  dispatch        per-dispatch host cost of one jitted no-op on
                  device-resident args (no readback), priced by delta.
  hoststack       _put_group's host-side np.stack of 4 bf16 batches.

Run on the real TPU (ambient JAX_PLATFORMS=axon):
    python tools/exp_feed_attrib.py [--rounds 3] [--json PATH]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

MODEL_BATCH = 32
FRAMES = 298  # 3 s clips through the 400/160 STFT geometry (bench.py)
NUM_MEL = 64
NUM_LANGS = 8
N_BUFS = 16


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    print(f"device: {jax.devices()[0]} ({jax.default_backend()})", flush=True)
    rng = np.random.default_rng(0)
    try:
        from ml_dtypes import bfloat16 as bf16
    except ImportError:
        bf16 = jnp.bfloat16
    feat = rng.normal(0, 1, (MODEL_BATCH, FRAMES, NUM_MEL)).astype(np.float32)
    feat_bufs = [(feat + i).astype(bf16) for i in range(N_BUFS)]
    tgt = rng.integers(0, NUM_LANGS, MODEL_BATCH).astype(np.int32)
    batch_mb = feat_bufs[0].nbytes / 1e6

    peek = jax.jit(lambda a: a.ravel()[0].astype(jnp.float32))
    peek_dict = jax.jit(lambda d: d["input"].ravel()[0].astype(jnp.float32)
                        + d["target"][0].astype(jnp.float32))
    np.asarray(peek(jax.device_put(feat_bufs[0])))
    np.asarray(peek_dict(jax.device_put({"input": feat_bufs[0],
                                         "target": tgt})))

    def leg_input_only():
        t0 = time.perf_counter()
        puts = [jax.device_put(b) for b in feat_bufs]
        np.asarray(peek(puts[-1]))
        return (time.perf_counter() - t0) / N_BUFS

    def leg_dict():
        t0 = time.perf_counter()
        puts = [jax.device_put({"input": b, "target": tgt})
                for b in feat_bufs]
        np.asarray(peek_dict(puts[-1]))
        return (time.perf_counter() - t0) / N_BUFS

    # packed: targets int32 [B] viewed as uint16 pairs -> bf16 bits in the
    # first 2B slots of ONE extra frame row appended to the batch
    def pack(b):
        extra = np.zeros((1, FRAMES, NUM_MEL), np.uint16)
        extra.ravel()[:2 * MODEL_BATCH] = tgt.view(np.uint16)
        return np.concatenate([b, extra.view(bf16)], axis=0)

    packed_bufs = [pack(b) for b in feat_bufs]

    def leg_packed():
        t0 = time.perf_counter()
        puts = [jax.device_put(b) for b in packed_bufs]
        np.asarray(peek(puts[-1]))
        return (time.perf_counter() - t0) / N_BUFS

    stack4 = [np.stack(feat_bufs[i:i + 4]) for i in range(0, N_BUFS, 4)]
    tgt4 = np.stack([tgt] * 4)

    def leg_stack4():
        t0 = time.perf_counter()
        puts = [jax.device_put({"input": s, "target": tgt4})
                for s in stack4]
        np.asarray(peek_dict(puts[-1]))
        return (time.perf_counter() - t0) / N_BUFS

    stack4p = [np.stack(packed_bufs[i:i + 4]) for i in range(0, N_BUFS, 4)]

    def leg_stack4_packed():
        t0 = time.perf_counter()
        puts = [jax.device_put(s) for s in stack4p]
        np.asarray(peek(puts[-1]))
        return (time.perf_counter() - t0) / N_BUFS

    def leg_hoststack():
        t0 = time.perf_counter()
        for i in range(0, N_BUFS, 4):
            np.stack(feat_bufs[i:i + 4])
        return (time.perf_counter() - t0) / N_BUFS

    # dispatch-only cost: n2 - n1 no-op dispatches on device-resident args
    dev_args = jax.device_put(feat_bufs[0])
    nop = jax.jit(lambda a, c: c + a.ravel()[0].astype(jnp.float32))

    def leg_dispatch():
        def run(iters):
            c = jnp.float32(0.0)
            t0 = time.perf_counter()
            for _ in range(iters):
                c = nop(dev_args, c)
            np.asarray(c)
            return time.perf_counter() - t0
        run(4)
        t1, t2 = run(8), run(24)
        return max(t2 - t1, 0.0) / 16

    # the real Trainer.fit lines
    import optax
    import lidbox_tpu.models as models
    from lidbox_tpu.losses import nll_loss
    from lidbox_tpu.train import Trainer
    model = models.create("xvector", (FRAMES, NUM_MEL), NUM_LANGS)
    model.init(jax.random.PRNGKey(0))
    trainer = Trainer(model, optax.adam(1e-3), nll_loss,
                      stage_dtype="bfloat16", prefetch=8)
    trainer.create_state()
    host_batches = [{"input": (feat + i).astype(np.float32), "target": tgt}
                    for i in range(24)]

    def fit_leg(spd, nb):
        def src(n=nb):
            return (host_batches[i % 24] for i in range(n))
        trainer.fit(lambda: src(2 * spd), epochs=1, verbose=False,
                    steps_per_dispatch=spd)  # warm
        t0 = time.perf_counter()
        trainer.fit(src, epochs=1, verbose=False, steps_per_dispatch=spd)
        return (time.perf_counter() - t0) / nb

    # --- bisect fit itself: which layer adds the residual over `dict`? ---
    def leg_put_only():
        """_compress + _put over the f32 host batches (conversion + dict
        device_put, NO staging thread, NO train step)."""
        t0 = time.perf_counter()
        last = None
        for b in host_batches:
            last = trainer._put(b)
        np.asarray(peek_dict({k: last[k] for k in ("input", "target")}))
        return (time.perf_counter() - t0) / len(host_batches)

    def leg_manual():
        """put + train step inline (single thread), one concat readback —
        fit minus _staged/callbacks/meter."""
        # the step DONATES its state arg: run on a copy, or the trainer's
        # own state buffers would be deleted out from under later legs
        state = {"s": jax.tree_util.tree_map(jnp.copy, trainer.state)}
        losses = []
        t0 = time.perf_counter()
        for b in host_batches:
            db = trainer._put(b)
            state["s"], loss = trainer._jit_train_step(state["s"], db,
                                                       trainer.rng)
            losses.append(loss)
        np.asarray(jnp.stack(losses))
        return (time.perf_counter() - t0) / len(host_batches)

    def leg_staged_nostep():
        """trainer._staged consumed with no compute: the staging
        machinery's own cost (producer thread + queue + put)."""
        t0 = time.perf_counter()
        last = None
        for _, db in trainer._staged(iter(host_batches)):
            last = db
        np.asarray(peek_dict({k: last[k] for k in ("input", "target")}))
        return (time.perf_counter() - t0) / len(host_batches)

    def leg_staged_step():
        """_staged + train step: the fit core without callbacks/meter."""
        state = {"s": jax.tree_util.tree_map(jnp.copy, trainer.state)}
        losses = []
        t0 = time.perf_counter()
        for _, db in trainer._staged(iter(host_batches)):
            state["s"], loss = trainer._jit_train_step(state["s"], db,
                                                       trainer.rng)
            losses.append(loss)
        np.asarray(jnp.stack(losses))
        return (time.perf_counter() - t0) / len(host_batches)

    legs = {
        "input_only": leg_input_only, "dict": leg_dict,
        "packed": leg_packed, "stack4": leg_stack4,
        "stack4_packed": leg_stack4_packed,
        "hoststack": leg_hoststack, "dispatch": leg_dispatch,
        "put_only": leg_put_only, "manual": leg_manual,
        "staged_nostep": leg_staged_nostep,
        "staged_step": leg_staged_step,
        "fit_spd1": lambda: fit_leg(1, 24),
        "fit_spd4": lambda: fit_leg(4, 48),
    }
    results = {k: [] for k in legs}
    for r in range(args.rounds):
        for name, fn in legs.items():
            dt = fn()
            results[name].append(dt)
            print(f"  round{r} {name}: {dt * 1e3:.1f} ms/batch", flush=True)
    summary = {k: {"min_ms": round(min(v) * 1e3, 2),
                   "all_ms": [round(x * 1e3, 1) for x in v]}
               for k, v in results.items()}
    summary["batch_mb"] = round(batch_mb, 3)
    print(json.dumps(summary, indent=2), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
