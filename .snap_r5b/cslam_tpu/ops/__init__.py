"""Jitted numeric cores (XLA + Pallas) for the hot loops of the framework."""
import functools

import jax


def highest_precision(fn):
    """Trace the wrapped function under ``highest`` matmul precision.

    TPU f32 matmuls default to reduced-precision bf16 passes — fine for
    descriptor similarity ranking, ruinous for iterative solvers: the PGO
    bench at default precision needed 17 GNC iterations for ATE 1.88 m; at
    highest precision 14 iterations reach ATE 0.84 m in nearly half the
    wall-clock. Apply to every linear-algebra-bearing solver.
    """
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)
    return wrapper
