"""Sweep the lax.scan unroll factor for the recurrent layers.

RNN_UNROLL=4 was measured best (1.66x over unroll=1) on the GRU layer in
f32. This re-sweeps {1, 2, 4, 8, 16} for forward and grad, f32 and bf16
inputs, at the bi_gru layer shape — if the optimum moved, update
lidbox_tpu/models/layers.py::RNN_UNROLL.

Run on the real chip: python tools/exp_rnn_unroll.py
"""
import sys

import numpy as np

sys.path.insert(0, ".")
from bench import _time, log  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from lidbox_tpu.models.layers import BidirectionalRNN

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    log(f"platform: {jax.default_backend()} {jax.devices()[0]}")

    B, T, F, H = 128, 298, 64, 512
    rng = np.random.default_rng(0)
    x32 = jnp.asarray(rng.normal(0, 1, (B, T, F)), jnp.float32)

    for dtype_name, x in (("f32", x32), ("bf16", x32.astype(jnp.bfloat16))):
        for unroll in (1, 2, 4, 8, 16):
            layer = BidirectionalRNN(H, cell="gru", unroll=unroll)
            params = layer.init(jax.random.PRNGKey(0), x[:2, :8])

            fwd = jax.jit(lambda c, p, x: jnp.mean(layer.apply(
                p, x + (c * 1e-30).astype(x.dtype))).astype(jnp.float32) + c)
            d = _time(lambda c: fwd(c, params, x), jnp.float32(0.0),
                      n1=3, n2=13, reps=5)
            g = jax.jit(lambda c, p, x: jnp.mean(jax.grad(
                lambda p: jnp.mean(layer.apply(
                    p, x + (c * 1e-30).astype(x.dtype))
                ).astype(jnp.float32) ** 2)(p)["params"]["GRUCell_0"]["hr"]["kernel"]) + c)
            dg = _time(lambda c: g(c, params, x), jnp.float32(0.0),
                       n1=3, n2=13, reps=5)
            log(f"  bigru[{dtype_name}, unroll={unroll:2d}]: "
                f"fwd {d*1e3:6.2f} ms  grad {dg*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
