"""Pallas TPU kernel: fused rollout + exact forward sensitivities.

The RTI prepare phase linearizes the discrete shooting dynamics at every
(stage, scenario) pair: F = step(x, u), J = d step / d (x, u) — the acados
ERK-forward-sensitivities role (NMPC_STM_acados_settings.py:238-240). In
plain XLA this is `vmap(jacfwd(step))`, which lowers to dozens of small
elementwise fusions whose intermediates round-trip HBM; measured ~1.4 ms
per batched step (batch 256, N=38) — the single largest chunk of the
closed-loop step — against a ~70 us flop bound.

Here the whole RK4 + JVP computation runs in one kernel invocation per
1024-element tile, every intermediate living in VMEM/registers. Layout:
(stage x scenario) elements fill full (8, 128) VPU tiles, one tile per
*variable* (structure-of-arrays), so each jnp op in the kernel is a dense
full-utilization VPU op. The dynamics are supplied as a tuple-form function
`step_tuple((x0..x7), (u0,u1)) -> (y0..y7)` (models/vehicle_stm.py
`pred_ode_tuple` + integrators.rk4_multistep_tree), and the Jacobian comes
from `jax.linearize` traced *inside* the kernel — exact AD, no hand-written
derivatives to get wrong.

`make_linearize_rollout(step_tuple, nx, nu)` returns a custom_vmap'd
per-scenario function `(N, nx+nu) -> (F (N, nx), J (N, nx, nx+nu))`; the
batched rule dispatches to the kernel on TPU/f32 and to vmap(jacfwd)
elsewhere (CPU f64 tests).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import custom_batching
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBS = 8       # sublanes per f32 tile
MAX_ROWS = 8   # element-tile height (rows > 8 currently trip Mosaic lowering)

from tum_control_tpu.ops.diffmode import DIFFERENTIABLE as _DIFF  # noqa: E402


def _make_kernel(step_tuple, nx: int, nv: int):
    def kernel(xu_ref, f_ref, j_ref):
        cols = tuple(xu_ref[0, v] for v in range(nv))  # nv x (R, LANES)

        def step_flat(*c):
            return step_tuple(c[:nx], c[nx:])

        y, lin = jax.linearize(step_flat, *cols)
        for i in range(nx):
            f_ref[0, i] = y[i]
        zero = jnp.zeros_like(cols[0])
        one = jnp.ones_like(cols[0])
        for v in range(nv):
            tang = lin(*[one if w == v else zero for w in range(nv)])
            for i in range(nx):
                j_ref[0, v, i] = tang[i]

    return kernel


def _kernel_path(step_tuple, XU, nx: int):
    """XU (B, N, nv) -> F (B, N, nx), J (B, N, nx, nv) via the tile kernel."""
    B, N, nv = XU.shape
    nel = B * N
    rows_total = -(-nel // LANES)
    T = -(-rows_total // MAX_ROWS)
    R = -(-(-(-rows_total // T)) // SUBS) * SUBS  # rows per tile, sublane-aligned
    tile = R * LANES
    flat = XU.reshape(nel, nv).T  # (nv, nel)
    if T * tile != nel:
        flat = jnp.pad(flat, ((0, 0), (0, T * tile - nel)))
    xut = jnp.transpose(flat.reshape(nv, T, R, LANES), (1, 0, 2, 3))

    f_t, j_t = pl.pallas_call(
        _make_kernel(step_tuple, nx, nv),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, nv, R, LANES), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=[
            pl.BlockSpec((1, nx, R, LANES), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nv, nx, R, LANES), lambda t: (t, 0, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, nx, R, LANES), XU.dtype),
            jax.ShapeDtypeStruct((T, nv, nx, R, LANES), XU.dtype),
        ],
    )(xut)

    F = jnp.transpose(f_t, (1, 0, 2, 3)).reshape(nx, T * tile)[:, :nel]
    F = F.T.reshape(B, N, nx)
    J = jnp.transpose(j_t, (1, 2, 0, 3, 4)).reshape(nv, nx, T * tile)[:, :, :nel]
    J = jnp.transpose(J, (2, 1, 0)).reshape(B, N, nx, nv)
    return F, J


def make_linearize_rollout(step_array, nx: int, nu: int, step_tuple_kernel=None):
    """Build the per-scenario linearization fn with a Pallas batched rule.

    `step_array`: array-form discrete step `(x (nx,), u (nu,)) -> (nx,)` used
    by the vmap(jacfwd) fallback (CPU/f64 tests; compact array jaxpr — the
    tuple form there explodes into thousands of scalar equations and
    multi-minute XLA CPU compiles).

    `step_tuple_kernel`: structure-of-arrays variant traced inside the Pallas
    kernel (per-variable tiles; `fastmath.atan_poly` substituted for
    jnp.arctan, which Mosaic cannot lower); must agree with `step_array` to
    f32 roundoff. Both must be stage-index-independent (true for the
    continuous prediction-model controllers; SNMPC's stop-flag dynamics
    provide their own structured `dyn_jac` instead, controllers/snmpc.py).
    """
    nv = nx + nu
    assert step_tuple_kernel is not None
    step_tuple_k = step_tuple_kernel

    def jacfwd_path(XU):  # (N, nv) -> (F, J)
        def step_xu(xu):
            return step_array(xu[:nx], xu[nx:])

        F = jax.vmap(step_xu)(XU)
        J = jax.vmap(jax.jacfwd(step_xu))(XU)
        return F, J

    if _DIFF:
        # differentiable mode: no custom_vmap / Pallas (ops/diffmode.py)
        return jacfwd_path

    @custom_batching.custom_vmap
    def lin_rollout(XU):
        return jacfwd_path(XU)

    @lin_rollout.def_vmap
    def _rule(axis_size, in_batched, XU):
        del axis_size
        (xb,) = in_batched
        assert xb, "linearize_rollout: XU must carry the batch axis"
        if jax.default_backend() == "tpu" and XU.dtype == jnp.float32:
            F, J = _kernel_path(step_tuple_k, XU, nx)
        else:
            F, J = jax.vmap(jacfwd_path)(XU)
        return (F, J), (True, True)

    return lin_rollout
