"""Microbench: spectral-lookup formulations on the real chip.

Compares, at the benchmark wavefront width, the cost of producing the
4 interpolated spectral slots + the emission iCDF sample per lane:

  gather1d   current: [B] idx -> [B, 2W] row gather -> column extraction
  gather2d   state as [B/128, 128]: gather with 2-D batch dims
  cheb       Chebyshev evaluation (deg 32/48/64), no gather at all
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

B = 1 << 19
L = 2048
W = 4
M = 2048
f = jnp.float32


def timeit(fn, *args, reps=50):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    rng = np.random.default_rng(0)
    spec_pack = jnp.asarray(rng.random((2 * L, 2 * W)), f)
    icdf_pairs = jnp.asarray(rng.random((M, 2)), f)
    wav = jnp.asarray(rng.uniform(400, 800, B), f)
    container = jnp.asarray(rng.integers(0, 2, B), jnp.int32)
    gamma = jnp.asarray(rng.random(B), f)

    x0, dx = 400.0, 400.0 / (L - 1)

    @jax.jit
    def gather1d(wav, container, gamma):
        posf = (wav - x0) / dx
        i0 = jnp.clip(posf.astype(jnp.int32), 0, L - 2)
        frac = posf - i0.astype(f)
        row = container * L + i0
        packed = spec_pack[row]
        slots = [
            packed[:, 2 * w] + frac * (packed[:, 2 * w + 1] - packed[:, 2 * w])
            for w in range(W)
        ]
        gposf = gamma * (M - 1)
        j0 = jnp.clip(gposf.astype(jnp.int32), 0, M - 2)
        gfrac = gposf - j0.astype(f)
        prow = icdf_pairs[j0]
        ems = prow[:, 0] + gfrac * (prow[:, 1] - prow[:, 0])
        return sum(slots) + ems

    @jax.jit
    def gather2d(wav, container, gamma):
        wav2 = wav.reshape(-1, 128)
        cont2 = container.reshape(-1, 128)
        gam2 = gamma.reshape(-1, 128)
        posf = (wav2 - x0) / dx
        i0 = jnp.clip(posf.astype(jnp.int32), 0, L - 2)
        frac = posf - i0.astype(f)
        row = cont2 * L + i0
        packed = spec_pack[row]  # [B/128, 128, 2W]
        slots = [
            packed[..., 2 * w]
            + frac * (packed[..., 2 * w + 1] - packed[..., 2 * w])
            for w in range(W)
        ]
        gposf = gam2 * (M - 1)
        j0 = jnp.clip(gposf.astype(jnp.int32), 0, M - 2)
        gfrac = gposf - j0.astype(f)
        prow = icdf_pairs[j0]
        ems = prow[..., 0] + gfrac * (prow[..., 1] - prow[..., 0])
        return (sum(slots) + ems).reshape(-1)

    def make_cheb(deg):
        coef = jnp.asarray(rng.random((2, W, deg + 1)), f)  # per (node, slot)
        ecoef = jnp.asarray(rng.random(deg + 1), f)

        @jax.jit
        def cheb(wav, container, gamma):
            t = (wav - 600.0) / 200.0
            # Clenshaw, W slots x 2 nodes selected by `container`
            acc = jnp.zeros(wav.shape, f)
            for n in range(2):
                sel = container == n
                for w in range(W):
                    c = coef[n, w]
                    b1 = jnp.zeros_like(t)
                    b2 = jnp.zeros_like(t)
                    for k in range(deg, 0, -1):
                        b1, b2 = 2.0 * t * b1 - b2 + c[k], b1
                    val = t * b1 - b2 + c[0]
                    acc = acc + jnp.where(sel, val, 0.0)
            tg = 2.0 * gamma - 1.0
            b1 = jnp.zeros_like(tg)
            b2 = jnp.zeros_like(tg)
            for k in range(deg, 0, -1):
                b1, b2 = 2.0 * tg * b1 - b2 + ecoef[k], b1
            ems = tg * b1 - b2 + ecoef[0]
            return acc + ems

        return cheb

    print(f"B={B} L={L} W={W}")
    print(f"gather1d  {timeit(gather1d, wav, container, gamma)*1e3:7.3f} ms")
    print(f"gather2d  {timeit(gather2d, wav, container, gamma)*1e3:7.3f} ms")
    for deg in (32, 48, 64):
        print(f"cheb{deg:3d}   {timeit(make_cheb(deg), wav, container, gamma)*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
