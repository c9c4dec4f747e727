"""Experiment: hoist RNN input projections out of the lax.scan.

flax's OptimizedLSTMCell/GRUCell compute the input projection x_t @ W_i
INSIDE the scanned step — T small matmuls. The classic TPU formulation
precomputes x @ W_i for ALL timesteps as one [B*T, F] x [F, G*H] MXU
matmul before the scan, leaving only the hidden-to-hidden matmul in the
sequential body. This measures that rewrite at the shapes our models run
(bi_gru layer 1: F=64, layer 2: F=1024; H=512), forward and grad.

Numerics: hoisted params are BUILT from the flax cell's params and the
outputs asserted allclose before timing.

Run on the real chip: python tools/exp_rnn_hoist.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, ".")
from bench import _time, log  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    log(f"platform: {jax.default_backend()} {jax.devices()[0]}")

    H = 512
    UNROLL = 4

    class HoistedLSTMCell(nn.RNNCellBase):
        features: int

        @nn.compact
        def __call__(self, carry, proj):
            c, h = carry
            y = proj + nn.Dense(4 * self.features, use_bias=True,
                                name="hh")(h)
            i, f, g, o = jnp.split(y, 4, axis=-1)
            i, f, o = nn.sigmoid(i), nn.sigmoid(f), nn.sigmoid(o)
            g = nn.tanh(g)
            new_c = f * c + i * g
            new_h = o * nn.tanh(new_c)
            return (new_c, new_h), new_h

        @nn.nowrap
        def initialize_carry(self, rng, input_shape):
            batch_dims = input_shape[:-1]
            k1, k2 = jax.random.split(rng)
            shape = batch_dims + (self.features,)
            return (jnp.zeros(shape), jnp.zeros(shape))

        @property
        def num_feature_axes(self):
            return 1

    class HoistedGRUCell(nn.RNNCellBase):
        features: int

        @nn.compact
        def __call__(self, carry, proj):
            h = carry
            hh = nn.Dense(3 * self.features, use_bias=False, name="hh")(h)
            hr, hz, hn = jnp.split(hh, 3, axis=-1)
            b_hn = self.param("hn_bias", nn.initializers.zeros,
                              (self.features,))
            pr, pz, pn = jnp.split(proj, 3, axis=-1)
            r = nn.sigmoid(pr + hr)
            z = nn.sigmoid(pz + hz)
            n = nn.tanh(pn + r * (hn + b_hn))
            new_h = (1.0 - z) * n + z * h
            return new_h, new_h

        @nn.nowrap
        def initialize_carry(self, rng, input_shape):
            return jnp.zeros(input_shape[:-1] + (self.features,))

        @property
        def num_feature_axes(self):
            return 1

    class BaseLSTM(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.RNN(nn.OptimizedLSTMCell(H, name="cell"),
                          unroll=UNROLL, name="rnn")(x)

    class HoistLSTM(nn.Module):
        @nn.compact
        def __call__(self, x):
            proj = nn.Dense(4 * H, use_bias=False, name="proj")(x)
            return nn.RNN(HoistedLSTMCell(H, name="cell"),
                          unroll=UNROLL, name="rnn")(proj)

    class BaseGRU(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.RNN(nn.GRUCell(H, name="cell"), unroll=UNROLL,
                          name="rnn")(x)

    class HoistGRU(nn.Module):
        @nn.compact
        def __call__(self, x):
            proj = nn.Dense(3 * H, use_bias=True, name="proj")(x)
            return nn.RNN(HoistedGRUCell(H, name="cell"),
                          unroll=UNROLL, name="rnn")(proj)

    def lstm_params_from_base(pb):
        cell = pb["params"]["cell"]
        cat = lambda ks: jnp.concatenate(  # noqa: E731
            [cell[k]["kernel"] for k in ks], axis=-1)
        return {"params": {
            "proj": {"kernel": cat(["ii", "if", "ig", "io"])},
            "cell": {"hh": {
                "kernel": cat(["hi", "hf", "hg", "ho"]),
                "bias": jnp.concatenate(
                    [cell[k]["bias"] for k in ["hi", "hf", "hg", "ho"]]),
            }}}}

    def gru_params_from_base(pb):
        cell = pb["params"]["cell"]
        return {"params": {
            "proj": {
                "kernel": jnp.concatenate(
                    [cell[k]["kernel"] for k in ["ir", "iz", "in"]], -1),
                "bias": jnp.concatenate(
                    [cell[k]["bias"] for k in ["ir", "iz", "in"]]),
            },
            "cell": {
                "hh": {"kernel": jnp.concatenate(
                    [cell[k]["kernel"] for k in ["hr", "hz", "hn"]], -1)},
                "hn_bias": cell["hn"]["bias"],
            }}}

    rng = np.random.default_rng(0)
    B, T = 128, 298
    for kind, Base, Hoist, convert in (
            ("lstm", BaseLSTM, HoistLSTM, lstm_params_from_base),
            ("gru", BaseGRU, HoistGRU, gru_params_from_base)):
        for F in (64, 1024):
            x = jnp.asarray(rng.normal(0, 1, (B, T, F)), jnp.float32)
            base, hoist = Base(), Hoist()
            pb = base.init(jax.random.PRNGKey(0), x[:2, :8])
            ph = convert(pb)

            # numerics: identical outputs on a small slice
            yb = base.apply(pb, x[:4, :16])
            yh = hoist.apply(ph, x[:4, :16])
            err = float(jnp.max(jnp.abs(yb - yh)))
            assert err < 1e-5, f"{kind} F={F}: numerics mismatch {err}"
            if os.environ.get("EXP_NUMERICS_ONLY"):
                log(f"  {kind} F={F}: numerics ok (max|err| {err:.1e})")
                continue

            fb = jax.jit(lambda c, p, x: jnp.mean(
                base.apply(p, x + c * 1e-30)) + c)
            fh = jax.jit(lambda c, p, x: jnp.mean(
                hoist.apply(p, x + c * 1e-30)) + c)
            db = _time(lambda c: fb(c, pb, x), jnp.float32(0.0),
                       n1=3, n2=13, reps=5)
            dh = _time(lambda c: fh(c, ph, x), jnp.float32(0.0),
                       n1=3, n2=13, reps=5)
            log(f"  {kind}[B{B} T{T} F{F} H{H}] fwd: base {db*1e3:.2f} ms"
                f" vs hoisted {dh*1e3:.2f} ms -> {db/dh:.2f}x"
                f"  (numerics max|err| {err:.1e})")

            gb = jax.jit(lambda c, p, x: jnp.mean(jax.grad(
                lambda p: jnp.mean(base.apply(p, x + c * 1e-30)) ** 2)(
                    p)["params"]["cell"]["hi" if kind == "lstm"
                                               else "hr"]["kernel"]) + c)
            gh = jax.jit(lambda c, p, x: jnp.mean(jax.grad(
                lambda p: jnp.mean(hoist.apply(p, x + c * 1e-30)) ** 2)(
                    p)["params"]["cell"]["hh"]["kernel"]) + c)
            dgb = _time(lambda c: gb(c, pb, x), jnp.float32(0.0),
                        n1=3, n2=13, reps=5)
            dgh = _time(lambda c: gh(c, ph, x), jnp.float32(0.0),
                        n1=3, n2=13, reps=5)
            log(f"  {kind}[B{B} T{T} F{F} H{H}] grad: base {dgb*1e3:.2f}"
                f" ms vs hoisted {dgh*1e3:.2f} ms -> {dgb/dgh:.2f}x")


if __name__ == "__main__":
    main()
