"""Uniform-grid spectral lookups (jnp).

The compiler resamples every spectrum/CDF onto shared uniform grids so
device-side lookups are O(1) gathers + lerp — no searchsorted in the hot
loop. This replaces the kernel's binary-search ``interp_clamped``
(_kernel.pyx:219-238) with a TPU-friendly constant-time form.
"""
import jax.numpy as jnp


def uniform_lookup(rows, row_index, x, x0, dx):
    """Linear interpolation on a shared uniform grid, edge-clamped.

    rows: [R, L] table; row_index: [...] int; x: [...] query points.
    x0, dx: grid origin and spacing (python floats).
    """
    L = rows.shape[-1]
    pos = (x - x0) / dx
    pos = jnp.clip(pos, 0.0, L - 1.0)
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, L - 2)
    frac = pos - i0
    y0 = rows[row_index, i0]
    y1 = rows[row_index, i0 + 1]
    return y0 + (y1 - y0) * frac


def uniform_lookup_1d(row, x, x0, dx):
    """Same as uniform_lookup for a single [L] row shared by all queries."""
    L = row.shape[-1]
    pos = jnp.clip((x - x0) / dx, 0.0, L - 1.0)
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, L - 2)
    frac = pos - i0
    return row[i0] + (row[i0 + 1] - row[i0]) * frac
