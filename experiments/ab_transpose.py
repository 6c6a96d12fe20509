"""A/B: (800K, 3) -> (3, E_pad) layout prep formulations on TPU."""
import sys

sys.path.insert(0, "/root/repo")  # noqa: E402

import time

import jax
import jax.numpy as jnp
import numpy as np

E, D, E_pad = 800_000, 3, 802_816
x0 = np.random.default_rng(0).standard_normal((E, D)).astype(np.float32)
PAD = 1.0e15


def time_loop(name, body):
    @jax.jit
    def run(x):
        def f(_, c):
            out = body(c)
            return c + 1e-9 * out[:, :1].sum()

        return jax.lax.fori_loop(0, 50, f, x)

    out = run(jnp.asarray(x0))
    jax.block_until_ready(out)
    best = float("inf")
    for t in range(3):
        xv = x0 + np.float32(1e-6 * (t + 1))
        t0 = time.perf_counter()
        o = run(jnp.asarray(xv))
        np.asarray(o[:2])
        best = min(best, time.perf_counter() - t0)
    print(f"{name:40s} {best/50*1e3:7.3f} ms", flush=True)


def v_current(x):
    return (jnp.full((E_pad, D), PAD, jnp.float32).at[:E].set(x)).T


def v_stack(x):
    cols = [jnp.concatenate([x[:, c], jnp.full((E_pad - E,), PAD,
                                               jnp.float32)])
            for c in range(D)]
    return jnp.stack(cols)


def v_transpose_then_pad(x):
    xt = x.T  # (3, E)
    return jnp.concatenate(
        [xt, jnp.full((D, E_pad - E), PAD, jnp.float32)], axis=1)


def v_reshape_3d(x):
    # transpose via (E/128, 128, 3) -> move minor: let XLA pick a tiled
    # path: reshape to (E, 3) -> (3, E) with explicit lax.transpose
    xp = jnp.full((E_pad, D), PAD, jnp.float32).at[:E].set(x)
    return jax.lax.transpose(xp, (1, 0))


for name, fn in [("pad.at[].set then .T (current)", v_current),
                 ("per-col concat + stack", v_stack),
                 ("T then pad (concat axis1)", v_transpose_then_pad),
                 ("lax.transpose of padded", v_reshape_3d)]:
    time_loop(name, fn)
