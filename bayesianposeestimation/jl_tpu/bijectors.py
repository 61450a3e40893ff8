"""Bijectors mapping between the model domain and the unconstrained domain R^n.

Semantics follow Bijectors.jl as used by the reference
(/root/reference/src/Samples.jl:66-81):

* ``forward(x)``: model domain -> unconstrained domain (e.g. ``log`` for a
  positive-support distribution).
* ``inverse(y)``: unconstrained -> model domain.
* ``inverse_with_logjac(y)``: returns ``(x, logabsdetjac)`` of the *inverse*
  transform evaluated at the unconstrained value ``y`` — exactly the quantity
  ``with_logabsdet_jacobian(inverse(b), v)`` the reference adds to the prior
  logdensity (/root/reference/src/Samples.jl:66-72).

Bijectors are stateless singletons so they can live inside jit-traced
closures and pytree static fields.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["Identity", "Log", "Logit", "IDENTITY", "LOG", "LOGIT", "is_identity"]


class Bijector:
    def __repr__(self):
        return type(self).__name__

    def __eq__(self, other):
        return type(self) is type(other)

    def __hash__(self):
        return hash(type(self))


class Identity(Bijector):
    """Identity bijector: unconstrained distributions (Normal, quaternions, ...)."""

    def forward(self, x):
        return x

    def inverse(self, y):
        return y

    def inverse_with_logjac(self, y):
        return y, jnp.zeros((), dtype=jnp.result_type(y))


class Log(Bijector):
    """Model domain (0, inf) -> R via log; inverse is exp.

    logabsdetjac of the inverse (exp) at y is y.
    """

    def forward(self, x):
        return jnp.log(x)

    def inverse(self, y):
        return jnp.exp(y)

    def inverse_with_logjac(self, y):
        return jnp.exp(y), y


class Logit(Bijector):
    """Model domain (0, 1) -> R via logit; inverse is the logistic sigmoid.

    logabsdetjac of the inverse (sigmoid) at y is
    ``log(sigmoid(y)) + log(1 - sigmoid(y)) = -softplus(y) - softplus(-y)``.
    """

    def forward(self, x):
        return jnp.log(x) - jnp.log1p(-x)

    def inverse(self, y):
        return jnp.reciprocal(1.0 + jnp.exp(-y))

    def inverse_with_logjac(self, y):
        x = self.inverse(y)
        logjac = -jnp.logaddexp(0.0, -y) - jnp.logaddexp(0.0, y)
        return x, logjac


IDENTITY = Identity()
LOG = Log()
LOGIT = Logit()


def is_identity(b) -> bool:
    return isinstance(b, Identity)
