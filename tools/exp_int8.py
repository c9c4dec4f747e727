"""Experiment: does int8 MXU arithmetic beat bf16 for the LId model
forwards on this chip? (v5e peak: 394 int8 TOPS vs 197 bf16 TFLOPS.)

Measures, interleaved in-process (bench.py::_time min-per-leg deltas):
  1. raw square matmul: bf16xbf16->f32 vs int8xint8->int32
  2. xvector-shaped conv1d stack dims as matmuls (the model's FLOP core)
  3. full xvector forward: bf16 vs weight+activation int8 (dynamic
     per-tensor activation scales, per-channel weight scales)

Run on the real chip: python tools/exp_int8.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import _time, log  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    log(f"platform: {jax.default_backend()} {jax.devices()[0]}")
    rng = np.random.default_rng(0)

    # --- 1. raw matmul ----------------------------------------------------
    for m, k, n in ((4096, 4096, 4096), (8192, 2048, 2048),
                    (93 * 512, 512 * 3, 512)):
        a8 = jnp.asarray(rng.integers(-127, 127, (m, k), np.int8))
        b8 = jnp.asarray(rng.integers(-127, 127, (k, n), np.int8))
        abf = jnp.asarray(rng.normal(0, 1, (m, k)), jnp.bfloat16)
        bbf = jnp.asarray(rng.normal(0, 1, (k, n)), jnp.bfloat16)

        # Readout must be a full reduction through an elementwise
        # nonlinearity: slicing (out[0,0]) lets XLA's algebraic
        # simplifier sink the slice into the dot operands and the
        # "matmul" measures one dot product (measured: 566 "TFLOP/s"
        # bf16, 2.9x over the chip's 197 peak — impossible).
        @jax.jit
        def step8(carry):
            # thread the carry INTO the matmul input: without a data
            # dependency the pooled backend overlaps successive programs
            # and the delta-timing reads ~0 (measured)
            # carry & 1 is NOT compile-time foldable (carry & 0 was:
            # XLA folded it to 0, the dependency vanished, and the
            # pooled backend overlapped programs -> 836 "TOP/s")
            a = jnp.bitwise_xor(a8, (carry & 1).astype(jnp.int8))
            out = jax.lax.dot_general(
                a, b8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            r = jnp.sum(jnp.abs(out).astype(jnp.float32))
            return (r.astype(jnp.int32) & 1) + carry

        @jax.jit
        def stepbf(carry):
            a = abf + (carry * 1e-30).astype(jnp.bfloat16)
            out = jax.lax.dot_general(
                a, bbf, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return jnp.sum(jnp.abs(out)) * 1e-30 + carry

        try:
            dt8 = _time(step8, jnp.int32(0), n1=5, n2=25, reps=5)
        except Exception as e:
            log(f"  int8[{m}x{k}x{n}] FAILED: {type(e).__name__}: {e}")
            dt8 = float("nan")
        dtbf = _time(stepbf, jnp.float32(0.0), n1=5, n2=25, reps=5)
        flops = 2 * m * k * n
        log(f"  matmul[{m}x{k}x{n}]: bf16 {dtbf*1e3:.3f} ms "
            f"({flops/dtbf/1e12:.1f} TFLOP/s) vs int8 {dt8*1e3:.3f} ms "
            f"({flops/dt8/1e12:.1f} TOP/s) -> int8 {dtbf/dt8:.2f}x")

    # --- 2. the xvector conv stack as chained matmuls ----------------------
    # Each causal Conv1D is an im2col matmul [B*T, k*Cin] x [k*Cin, Cout].
    # The int8 leg includes the REAL integration overhead: dynamic
    # per-tensor activation quantization (amax -> scale -> round -> clip)
    # before each matmul and an f32 rescale + relu after it.
    B, T = 512, 298
    stack = [  # (k*Cin, Cout, T_out) for xvector frame1..5 at F=64
        (5 * 64, 512, T), (3 * 512, 512, T // 2), (3 * 512, 512, T // 6),
        (1 * 512, 512, T // 6), (1 * 512, 1500, T // 6)]
    # generate activations ON DEVICE — ~1 GB of host-generated constants
    # takes minutes through the tunnel (measured stall)
    keys = jax.random.split(jax.random.PRNGKey(1), len(stack))
    acts = [jax.jit(lambda kk, sh=(B * t, k): jax.random.normal(
        kk, sh, jnp.float32))(kk) for kk, (k, _, t) in zip(keys, stack)]
    log("  (activations generated on device)")
    w_f32 = [jnp.asarray(rng.normal(0, 0.05, (k, n)), np.float32)
             for k, n, _ in stack]
    wbf = [w.astype(jnp.bfloat16) for w in w_f32]
    # per-output-channel int8 weight quantization (static, offline)
    wscale = [jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0
              for w in w_f32]
    w8 = [jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
          for w, s in zip(w_f32, wscale)]

    # NB: the big arrays are passed as jit ARGUMENTS — closing over a
    # device array embeds it as an HLO constant, which fetches it back
    # to the host through the tunnel (measured: minutes for ~1 GB).
    @jax.jit
    def stack_bf16(carry, acts, wbf):
        out = carry
        for x, w in zip(acts, wbf):
            h = jax.lax.dot_general(
                (x + out * 1e-30).astype(jnp.bfloat16), w,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            out = jnp.mean(jax.nn.relu(h))
        return out

    @jax.jit
    def stack_int8(carry, acts, w8, wscale):
        out = carry
        for x, w, ws in zip(acts, w8, wscale):
            xs = jnp.max(jnp.abs(x)) / 127.0 + 1e-12  # dynamic act scale
            x8 = jnp.clip(jnp.round((x + out * 1e-30) / xs),
                          -127, 127).astype(jnp.int8)
            h32 = jax.lax.dot_general(
                x8, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            h = h32.astype(jnp.float32) * (xs * ws)  # rescale epilogue
            out = jnp.mean(jax.nn.relu(h))
        return out

    acts_t, wbf_t, w8_t, ws_t = (tuple(acts), tuple(wbf), tuple(w8),
                                 tuple(wscale))
    dt_bf = _time(lambda c: stack_bf16(c, acts_t, wbf_t),
                  jnp.float32(0.0), n1=5, n2=25, reps=5)
    try:
        dt_8 = _time(lambda c: stack_int8(c, acts_t, w8_t, ws_t),
                     jnp.float32(0.0), n1=5, n2=25, reps=5)
    except Exception as e:
        log(f"  int8 conv stack FAILED: {type(e).__name__}: {e}")
        dt_8 = float("nan")
    gflop = 2 * sum(B * t * k * n for k, n, t in stack) / 1e9
    log(f"  xvector-conv-stack[b{B}] ({gflop:.1f} GFLOP): "
        f"bf16 {dt_bf*1e3:.3f} ms ({gflop/dt_bf/1e3:.1f} TFLOP/s) vs "
        f"int8+dynquant {dt_8*1e3:.3f} ms ({gflop/dt_8/1e3:.1f} TOP/s) "
        f"-> int8 {dt_bf/dt_8:.2f}x")

    # --- 3. full xvector forward baseline (for context) --------------------
    import lidbox_tpu.models as models
    F, N = 64, 8
    model = models.create("xvector", (T, F), N)
    model.init(jax.random.PRNGKey(0))
    x = jax.jit(lambda kk: jax.random.normal(
        kk, (B, T, F), jnp.float32))(jax.random.PRNGKey(2))

    @jax.jit
    def fwd_bf16(carry, variables, x):
        out = model.apply(variables, x + carry * 1e-20, train=False,
                          compute_dtype=jnp.bfloat16)
        return jnp.mean(out)

    variables = model.variables
    dt_fwd = _time(lambda c: fwd_bf16(c, variables, x),
                   jnp.float32(0.0), n1=5, n2=25, reps=5)
    log(f"  xvector-fwd[b{B}] bf16: {dt_fwd*1e3:.3f} ms "
        f"-> {B/dt_fwd:,.0f} utt/s")


if __name__ == "__main__":
    main()
