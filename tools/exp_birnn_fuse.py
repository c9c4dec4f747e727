"""Experiment: fuse a bidirectional RNN's two direction scans into ONE
lax.scan via a direction-vmapped step.

flax nn.RNN runs the forward and backward directions as two sequential
scans — 2T sequential small matmuls. vmapping the step over a leading
direction axis runs both directions in each scan step: T steps of one
batched [2, B, H] x [2, H, 3H] matmul. If the scan is overhead- or
latency-bound (it is: 298 steps x ~20 us at b128), this approaches 2x.

Numerics: the fused GRU step reproduces flax GRUCell math exactly
(verified below against BidirectionalRNN with mapped params).

Run on the real chip: python tools/exp_birnn_fuse.py
"""
import os
import sys

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

    H = 512
    UNROLL = 4
    rng = np.random.default_rng(0)

    def gru_step(h, xw, params):
        """One GRU step from a PRE-PROJECTED input? No — project inside,
        like flax: xw is x_t, params = (Wi [F,3H], bi [3H], Wh [H,3H],
        b_hn [H]). Gate order r, z, n."""
        Wi, bi, Wh, bhn = params
        pi = xw @ Wi + bi
        ph = h @ Wh
        pr, pz, pn = jnp.split(pi, 3, axis=-1)
        hr, hz, hn = jnp.split(ph, 3, axis=-1)
        r = jax.nn.sigmoid(pr + hr)
        z = jax.nn.sigmoid(pz + hz)
        n = jnp.tanh(pn + r * (hn + bhn))
        return (1.0 - z) * n + z * h

    def run_two_scans(params_f, params_b, x):
        """Baseline: two sequential scans (what nn.RNN does)."""
        B = x.shape[0]
        xT = jnp.swapaxes(x, 0, 1)                      # [T, B, F]

        def step(h, xt, params):
            h = gru_step(h, xt, params)
            return h, h
        h0 = jnp.zeros((B, H), x.dtype)
        _, yf = jax.lax.scan(lambda h, xt: step(h, xt, params_f),
                             h0, xT, unroll=UNROLL)
        _, yb = jax.lax.scan(lambda h, xt: step(h, xt, params_b),
                             h0, xT[::-1], unroll=UNROLL)
        yb = yb[::-1]
        return jnp.concatenate([jnp.swapaxes(yf, 0, 1),
                                jnp.swapaxes(yb, 0, 1)], axis=-1)

    def run_fused(params_f, params_b, x):
        """ONE scan, direction axis vmapped into the step."""
        B = x.shape[0]
        xT = jnp.swapaxes(x, 0, 1)                      # [T, B, F]
        xs = jnp.stack([xT, xT[::-1]], axis=1)          # [T, 2, B, F]
        params = jax.tree_util.tree_map(
            lambda a, b: jnp.stack([a, b]), params_f, params_b)

        step2 = jax.vmap(gru_step, in_axes=(0, 0, 0))   # over direction

        def step(h2, xt2):
            h2 = step2(h2, xt2, params)
            return h2, h2
        h0 = jnp.zeros((2, B, H), x.dtype)
        _, y = jax.lax.scan(step, h0, xs, unroll=UNROLL)  # [T, 2, B, H]
        yf = jnp.swapaxes(y[:, 0], 0, 1)
        yb = jnp.swapaxes(y[::-1][:, 1], 0, 1)
        return jnp.concatenate([yf, yb], axis=-1)

    def make_params(F, seed):
        r = np.random.default_rng(seed)
        return (jnp.asarray(r.normal(0, 0.05, (F, 3 * H)), jnp.float32),
                jnp.zeros(3 * H, jnp.float32),
                jnp.asarray(r.normal(0, 0.05, (H, 3 * H)), jnp.float32),
                jnp.zeros(H, jnp.float32))

    B, T = 128, 298
    for F in (64, 1024):
        x = jnp.asarray(rng.normal(0, 1, (B, T, F)), jnp.float32)
        pf, pb = make_params(F, 1), make_params(F, 2)

        ya = run_two_scans(pf, pb, x[:4, :16])
        yb_ = run_fused(pf, pb, x[:4, :16])
        err = float(jnp.max(jnp.abs(ya - yb_)))
        assert err < 1e-5, f"F={F}: fused numerics mismatch {err}"
        if os.environ.get("EXP_NUMERICS_ONLY"):
            log(f"  F={F}: numerics ok (max|err| {err:.1e})")
            continue

        f_two = jax.jit(lambda c, pf, pb, x: jnp.mean(
            run_two_scans(pf, pb, x + c * 1e-30)) + c)
        f_one = jax.jit(lambda c, pf, pb, x: jnp.mean(
            run_fused(pf, pb, x + c * 1e-30)) + c)
        d2 = _time(lambda c: f_two(c, pf, pb, x), jnp.float32(0.0),
                   n1=3, n2=13, reps=5)
        d1 = _time(lambda c: f_one(c, pf, pb, x), jnp.float32(0.0),
                   n1=3, n2=13, reps=5)
        log(f"  bigru-layer[B{B} T{T} F{F} H{H}] fwd: two-scans "
            f"{d2*1e3:.2f} ms vs fused-scan {d1*1e3:.2f} ms "
            f"-> {d2/d1:.2f}x")

        g2 = jax.jit(lambda c, pf, pb, x: jnp.mean(jax.grad(
            lambda p: jnp.mean(run_two_scans(p, pb, x + c * 1e-30)) ** 2)(
                pf)[2]) + c)
        g1 = jax.jit(lambda c, pf, pb, x: jnp.mean(jax.grad(
            lambda p: jnp.mean(run_fused(p, pb, x + c * 1e-30)) ** 2)(
                pf)[2]) + c)
        dg2 = _time(lambda c: g2(c, pf, pb, x), jnp.float32(0.0),
                    n1=3, n2=13, reps=5)
        dg1 = _time(lambda c: g1(c, pf, pb, x), jnp.float32(0.0),
                    n1=3, n2=13, reps=5)
        log(f"  bigru-layer[B{B} T{T} F{F} H{H}] grad: two-scans "
            f"{dg2*1e3:.2f} ms vs fused-scan {dg1*1e3:.2f} ms "
            f"-> {dg2/dg1:.2f}x")


if __name__ == "__main__":
    main()
