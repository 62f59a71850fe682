"""Pallas TPU kernel: batched modified-Bessel K logarithmic derivative.

The BASELINE names complex Bessel I_m/K_m evaluation as the framework's
custom-kernel target: the cylinder exterior contributes one K_m'(z)/K_m(z)
per (omega, k) candidate. This kernel fuses the ascending series and the CF2
continued fraction (same algorithm as `eigensolver_tpu.special.kve_ratio`)
into a single VMEM-resident pass on the VPU - no intermediate series terms
ever reach HBM.

Real arguments only (the complex Kelvin-Helmholtz path keeps the pure-JAX
version; XLA fuses it adequately, and complex VMEM tiles are not supported).
Falls back to the pure-JAX implementation off-TPU.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .. import special

_LANE = 128
_SUBLANE = 8
_BLOCK = _LANE * _SUBLANE


def _kve_ratio_block(z):
    """Same math as special.kve_ratio, written block-wise for the VPU."""
    small = jnp.abs(z) < 2.0
    zs = jnp.where(small, z, 1.0)
    zl = jnp.where(small, 4.0, z)

    # ascending series (m=0 and m=1 interleaved on the same block)
    z2 = 0.25 * zs * zs
    half_log = jnp.log(0.5 * zs)
    one = jnp.ones_like(zs)
    term = one
    I0 = one
    K0sum = jnp.zeros_like(zs)
    Hk = 0.0
    for kk in range(1, special._N_SERIES + 1):
        term = term * z2 / (kk * kk)
        Hk = Hk + 1.0 / kk
        I0 = I0 + term
        K0sum = K0sum + term * Hk
    K0 = -(half_log + special._EULER_GAMMA) * I0 + K0sum

    s = one
    term = one
    for kk in range(1, special._N_SERIES + 1):
        term = term * z2 / (kk * (kk + 1))
        s = s + term
    I1 = 0.5 * zs * s
    ssum = jnp.zeros_like(zs)
    term = one
    Hk = 0.0
    Hk1 = 1.0
    ssum = ssum + term * (Hk + Hk1)
    for kk in range(1, special._N_SERIES + 1):
        term = term * z2 / (kk * (kk + 1))
        Hk = Hk + 1.0 / kk
        Hk1 = Hk1 + 1.0 / (kk + 1)
        ssum = ssum + term * (Hk + Hk1)
    K1 = 1.0 / zs + (half_log + special._EULER_GAMMA) * I1 - 0.25 * zs * ssum

    # CF2 for |z| >= 2
    a1 = 0.25
    b = 2.0 * (1.0 + zl)
    d = 1.0 / b
    delh = d
    h = d
    a = -a1
    for i in range(2, special._N_CF2 + 2):
        a = a - 2.0 * (i - 1)
        b = b + 2.0
        d = 1.0 / (b + a * d)
        delh = (b * d - 1.0) * delh
        h = h + delh
    h = a1 * h

    r10 = jnp.where(small, K1 / K0, (zl + 0.5 - h) / zl)
    ratio0 = -r10                      # K0'/K0
    ratio1 = -1.0 / r10 - 1.0 / z      # K1'/K1
    return ratio0, ratio1


def _kernel(z_ref, r0_ref, r1_ref):
    r0, r1 = _kve_ratio_block(z_ref[:])
    r0_ref[:] = r0
    r1_ref[:] = r1


# Rows of 128 lanes processed per grid step. Bounded so the unrolled
# series/CF temporaries (~30 live full-block f32 arrays) stay well inside
# the 128 MB VMEM budget: 128 x 128 x 4 B x ~30 = ~2 MB. Without a grid a
# million-candidate sweep spills ~150 MB of register slots and the TPU
# compile aborts (measured on cyl_flow_1).
_GRID_ROWS = 128


@partial(jax.jit, static_argnames=("interpret",))
def kve_ratio_pallas(z: jnp.ndarray, interpret: bool = False):
    """(K0'/K0, K1'/K1) for a flat batch of real z > 0 via one Pallas kernel.
    Pads to the (8, 128) f32 tile internally; batches beyond _GRID_ROWS*128
    elements are tiled over a 1-D grid."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = z.shape[0]
    # Block row count adapts to the batch: small batches pad only to the
    # (8, 128) f32 tile (a 1024-element launch), large ones to full
    # _GRID_ROWS rows - so a handful of exterior points no longer pays a
    # fixed 16384-element launch (16x redundant VPU work).
    rows_needed = -(-max(n, 1) // _LANE)
    br = min(_GRID_ROWS, -(-rows_needed // _SUBLANE) * _SUBLANE)
    pad = (-n) % (br * _LANE)
    zp = jnp.pad(z.astype(jnp.float32), (0, pad), constant_values=1.0)
    rows = zp.shape[0] // _LANE
    zp = zp.reshape(rows, _LANE)
    grid = rows // br

    block = pl.BlockSpec((br, _LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    r0, r1 = pl.pallas_call(
        _kernel,
        grid=(grid,),
        out_shape=(jax.ShapeDtypeStruct((rows, _LANE), jnp.float32),
                   jax.ShapeDtypeStruct((rows, _LANE), jnp.float32)),
        in_specs=[block],
        out_specs=(block, block),
        interpret=interpret,
    )(zp)
    return r0.reshape(-1)[:n], r1.reshape(-1)[:n]


def kve_ratio_batch(m: int, z: jnp.ndarray, use_pallas: bool | None = None):
    """Dispatch: Pallas on TPU for real float batches, pure JAX otherwise."""
    if use_pallas is None:
        use_pallas = (jax.default_backend() not in ("cpu",)
                      and not jnp.iscomplexobj(z))
    if use_pallas:
        r0, r1 = kve_ratio_pallas(z)
        return r0 if m == 0 else r1
    return special.kve_ratio(m, z)


# ---------------------------------------------------------------------------
# Hot-path wrapper: scalar semantics, Pallas under vmap
# ---------------------------------------------------------------------------

def _hot_dispatch(z):
    """Which implementation a BATCHED kve_ratio_both call should use.
    Split out so tests can monkeypatch it (e.g. force the Pallas kernel in
    interpret mode on CPU).

    RETIRED from the default hot path (r04): the exterior ratio is a pure
    elementwise series+CF2 chain that XLA fuses into the surrounding
    dispersion program, so the Pallas launch boundary can only add cost -
    measured on TPU it LOSES its own A/B on the full coronal-density sweep
    in every round (artifacts/bessel_ab_r04.json: r02 172.6k vs 174.3k,
    r03 164.3k vs 170.7k, r04 386.9k vs 394.3k cands/s). Set
    EIGENSOLVER_BESSEL_PALLAS=1 to re-enable for experiments; the kernel
    itself stays tested (tests/test_special.py, interpret mode)."""
    if jnp.iscomplexobj(z) or jax.default_backend() == "cpu":
        return "jax"
    if z.dtype != jnp.float32:
        return "jax"           # the VMEM tile is f32; f64 stays pure-JAX
    if jax.config.jax_enable_x64:
        # under global x64 (e.g. a host-side f64 refinement pass in the same
        # process) Pallas lowers grid/index scalars as i64, which Mosaic
        # cannot legalize ("func.return (i32, i64)" compile failure on TPU);
        # the math here is f32 either way, so fall back to the XLA path
        return "jax"
    import os
    if os.environ.get("EIGENSOLVER_BESSEL_PALLAS") == "1":
        return "pallas"
    return "jax"


from jax import custom_batching as _custom_batching


@_custom_batching.custom_vmap
def kve_ratio_both_hot(z):
    """(K_0'/K_0, K_1'/K_1) with scalar semantics identical to
    `special.kve_ratio_both`, but whose vmap rule routes the whole batch
    through the fused Pallas kernel on TPU. This is what puts the kernel in
    the cylinder dispersion hot path (`physics/cylinder.py` exterior,
    replacing the reference's numeric exterior integration,
    `Density_cylinder.py:628-634`) while the physics code stays written
    per-candidate."""
    return special.kve_ratio_both(z)


@kve_ratio_both_hot.def_vmap
def _kve_ratio_both_vmap_rule(axis_size, in_batched, z):
    del axis_size, in_batched
    if _hot_dispatch(z) == "pallas":
        shape = z.shape
        r0, r1 = kve_ratio_pallas(z.reshape(-1))
        r0, r1 = r0.reshape(shape), r1.reshape(shape)
    else:
        r0, r1 = special.kve_ratio_both(z)
    return (r0, r1), (True, True)
