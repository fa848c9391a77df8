"""Dirichlet kernel (capability parity with reference src/diric.jl:38-64)."""

import jax.numpy as jnp

__all__ = ["diric"]


def diric(omega, n):
    """Periodic sinc / Dirichlet kernel diric(omega, n) =
    sin(n*omega/2) / (n*sin(omega/2)), with exact +/-1 at the
    period points (reference src/diric.jl:38-64). Vectorized over omega."""
    if n <= 0:
        raise ValueError("n must be positive")
    omega = jnp.asarray(omega, dtype=jnp.result_type(omega, jnp.float32))
    two_pi = 2 * jnp.pi

    if n % 2 == 1:
        w = omega - two_pi * jnp.round(omega / two_pi)  # [-pi, pi)
        sign = jnp.ones_like(w)
    else:
        w = 2 * (omega / 2 - two_pi * jnp.round(omega / (2 * two_pi)))  # [-2pi, 2pi)
        sign = jnp.where(jnp.abs(w) > jnp.pi, -1.0, 1.0)
        w = jnp.where(w > jnp.pi, w - two_pi, jnp.where(w < -jnp.pi, w + two_pi, w))

    denom = jnp.sin(w / 2)
    atol = jnp.finfo(omega.dtype).eps
    near_zero = jnp.abs(denom) <= atol
    safe = jnp.where(near_zero, 1.0, denom)
    val = sign * jnp.sin(w * n / 2) / (n * safe)
    return jnp.where(near_zero, sign, val)
