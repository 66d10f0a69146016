"""In-jit debug checks (SURVEY.md §5 sanitizers row; VERDICT r1 item 8).

The reference validates arguments with loguru ``CHECK_F`` at every API call
(SURVEY.md §2 C12) and relies on the debugger for NaN hunts. The TPU-native
equivalent has three tiers:

1. trace-time shape/type validation — always on (operators.assemble);
2. host-side problem audit — ``operators.validate_problem`` (outside jit);
3. THIS module: `checkify`-instrumented execution, toggled by
   ``SolverConfig(debug=True)``. Input sanity checks (finite positions /
   values / weights, positions inside the lattice) become functionalized
   ``checkify.check``s, and JAX's automatic float checks flag any NaN/Inf
   *produced inside* the jitted assemble+solve — so a poisoned input or an
   unstable solve surfaces as a precise Python exception instead of a silent
   NaN field.

Debug mode trades speed for observability: the float checks instrument every
primitive, so drivers force ``backend="xla"`` (Pallas kernels can't carry the
error state) and expect ~2-5× slowdown. Production solves keep the flag off.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax.experimental import checkify

from .grid import Grid

# NaN/Inf production + explicit user checks. (Index OOB checks are part of
# user_checks/float_checks domains; gather/scatter indices here are clamped
# by construction, so div/nan coverage is what matters.)
DEBUG_ERRORS = checkify.float_checks | checkify.user_checks


def check_sample_inputs(
    grid: Grid,
    positions: jnp.ndarray,
    values: Optional[jnp.ndarray] = None,
    gradients: Optional[jnp.ndarray] = None,
    point_weights: Optional[jnp.ndarray] = None,
) -> None:
    """Functionalized argument checks (the reference's CHECK_F layer, run
    IN-JIT): everything finite, positions inside the lattice domain."""
    checkify.check(jnp.all(jnp.isfinite(positions)),
                   "debug: non-finite sample position")
    shape = jnp.asarray(grid.shape, positions.dtype)
    inb = jnp.all((positions >= 0.0) & (positions <= shape - 1.0))
    checkify.check(inb, "debug: sample position outside the lattice "
                        "(production mode zero-weights these rows)")
    if values is not None:
        checkify.check(jnp.all(jnp.isfinite(values)),
                       "debug: non-finite sample value")
    if gradients is not None:
        checkify.check(jnp.all(jnp.isfinite(gradients)),
                       "debug: non-finite sample gradient")
    if point_weights is not None:
        checkify.check(jnp.all(jnp.isfinite(point_weights)),
                       "debug: non-finite point weight")
        checkify.check(jnp.all(point_weights >= 0.0),
                       "debug: negative point weight (operator loses "
                       "positive-semidefiniteness)")


def check_solution(x: jnp.ndarray) -> None:
    checkify.check(jnp.all(jnp.isfinite(x)),
                   "debug: solver produced a non-finite field")


def checked_call(fn, *args):
    """Run ``fn(*args)`` under checkify and throw any collected error as a
    Python exception (jit/while_loop/scan inside ``fn`` are supported)."""
    err, out = checkify.checkify(fn, errors=DEBUG_ERRORS)(*args)
    err.throw()
    return out
