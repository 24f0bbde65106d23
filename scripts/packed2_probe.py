"""Probe: 2-node lane packing for the <=64-wide integrand (UCI shape).

The integrand MLP is 50 lanes wide on 128-lane hardware; packing TWO
quadrature nodes per matmul row via block-diagonal weights doubles lane
occupancy ([M, 62] x [62, 100] instead of two [M, 31] x [31, 50]) and
halves the M dimension. Gradients flow through the jnp-built block-diag
automatically, so the naive-autodiff quadrature gets the packing for free
(at small configs where storing node activations is fine — exactly where
the XLA path is selected).

Measures a full fwd+bwd train-step equivalent: packed vs unpacked XLA
megabatch, interleaved, at the UCI parity config.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from umnn_tpu.nn.core import ACTIVATIONS, mlp_init
from umnn_tpu.ops.quadrature import cc_quadrature

B, D, E, N = 500, 6, 30, 50
HIDDEN = (50, 50, 50, 50)


def build_params(key):
    return mlp_init(key, [1 + E, *HIDDEN, 1])


def unpacked_integral(layers, x, h, nodes, weights):
    """Current XLA megabatch: rows [B, K, D, 1+e]."""
    s = (nodes + 1.0) * 0.5  # [K]
    X = x[:, None, :] * s[None, :, None]  # [B, K, D]
    feat = jnp.concatenate(
        [X[..., None], jnp.broadcast_to(h[:, None], (B, len(s), D, E))], axis=-1
    )
    a = feat
    act = ACTIVATIONS["LeakyReLU"]
    for p in layers[:-1]:
        a = act(a @ p["w"] + p["b"])
    f = ACTIVATIONS["ELUPlus"](a @ layers[-1]["w"] + layers[-1]["b"])[..., 0]
    return jnp.einsum("bkd,k->bd", f, weights) * x * 0.5


def packed_integral(layers, x, h, nodes, weights):
    """2 nodes per row: rows [B, K/2, D, 2*(1+e)], block-diag weights."""
    K = nodes.shape[0]
    K2 = (K + 1) // 2
    s = (nodes + 1.0) * 0.5
    s = jnp.concatenate([s, jnp.zeros(2 * K2 - K, s.dtype)])
    w = jnp.concatenate([weights, jnp.zeros(2 * K2 - K, weights.dtype)])
    s_a, s_b = s[0::2], s[1::2]  # [K2]
    w_a, w_b = w[0::2], w[1::2]
    Xa = x[:, None, :] * s_a[None, :, None]  # [B, K2, D]
    Xb = x[:, None, :] * s_b[None, :, None]
    hb = jnp.broadcast_to(h[:, None], (B, K2, D, E))
    feat = jnp.concatenate([Xa[..., None], hb, Xb[..., None], hb], axis=-1)

    act = ACTIVATIONS["LeakyReLU"]
    a = feat
    for p in layers[:-1]:
        i, o = p["w"].shape
        wbd = jnp.block(
            [[p["w"], jnp.zeros((i, o))], [jnp.zeros((i, o)), p["w"]]]
        )
        a = act(a @ wbd + jnp.concatenate([p["b"], p["b"]]))
    i, o = layers[-1]["w"].shape
    wbd = jnp.block(
        [[layers[-1]["w"], jnp.zeros((i, o))], [jnp.zeros((i, o)), layers[-1]["w"]]]
    )
    f2 = ACTIVATIONS["ELUPlus"](a @ wbd + jnp.concatenate([layers[-1]["b"]] * 2))
    fa, fb = f2[..., 0], f2[..., 1]  # [B, K2, D]
    z = jnp.einsum("bkd,k->bd", fa, w_a) + jnp.einsum("bkd,k->bd", fb, w_b)
    return z * x * 0.5


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    key = jax.random.PRNGKey(0)
    layers = build_params(key)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, D))
    h = jax.random.normal(jax.random.PRNGKey(2), (B, D, E))
    n_np, w_np = cc_quadrature(N)
    nodes = jnp.asarray(n_np, jnp.float32)
    ccw = jnp.asarray(w_np, jnp.float32)

    # correctness first
    zu = unpacked_integral(layers, x, h, nodes, ccw)
    zp = packed_integral(layers, x, h, nodes, ccw)
    err = float(jnp.max(jnp.abs(zu - zp)))
    print(f"max |packed - unpacked| = {err:.2e}", flush=True)
    assert err < 1e-3

    steps = {}
    for name, fn in (("unpacked", unpacked_integral), ("packed", packed_integral)):
        def loss(ls, x, h, fn=fn):
            z = fn(ls, x, h, nodes, ccw)
            return jnp.mean(z**2)

        steps[name] = jax.jit(jax.value_and_grad(loss))

    floors, best = {}, {}
    for name, step in steps.items():
        _ = float(step(layers, x, h)[0])
        fl = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(step(layers, x, h)[0])
            fl = min(fl, time.perf_counter() - t0)
        floors[name] = fl
        best[name] = 1e9
    for r in range(6):
        for name, step in steps.items():
            t0 = time.perf_counter()
            for _ in range(iters):
                out = step(layers, x, h)
            _ = float(out[0])
            dt = (time.perf_counter() - t0 - floors[name]) / (iters - 1)
            best[name] = min(best[name], dt)
            print(f"round {r} {name}: {dt*1e3:.3f} ms", flush=True)
    print(json.dumps({k: round(v * 1e3, 3) for k, v in best.items()}))


if __name__ == "__main__":
    sys.exit(main())

# Measured (v5e, min over 6 interleaved rounds): unpacked 0.883 ms,
# packed 0.806 ms — ~9%, within the chip's run-to-run drift. The UCI-config
# megabatch is HBM-bandwidth-bound (the [B*K*D, features] activations
# round-trip dominates), so halving matmul rows via lane packing does not
# pay; packing only helps MXU-bound regimes, which this config never
# reaches. Negative result recorded; not integrated into the framework.
