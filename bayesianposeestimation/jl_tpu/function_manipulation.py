"""Partial application with the reference's ``f | args`` sugar.

Parity target: /root/reference/src/FunctionManipulation.jl —
``ManipulatedFunction`` + the ``|`` operator (:28-74) condition a function on
leading arguments without closures (CUDA-compatible there; here it is plain
``functools.partial`` semantics, jit-traceable and hashable so conditioned
functions can be static jit arguments).

    z_fn = pipeable(pixel_mixture) | (min_d, max_d, theta, sigma)
    dist = z_fn(mu, o)
"""

from __future__ import annotations

__all__ = ["ManipulatedFunction", "pipeable"]


class ManipulatedFunction:
    """Function with leading arguments bound; supports further ``| args``."""

    def __init__(self, fn, *args, **kwargs):
        self.fn = fn
        self.args = args
        self.kwargs = kwargs

    def __call__(self, *more, **kw):
        return self.fn(*self.args, *more, **{**self.kwargs, **kw})

    def __or__(self, args):
        if not isinstance(args, tuple):
            args = (args,)
        return ManipulatedFunction(self.fn, *self.args, *args, **self.kwargs)

    # hashable/static: identity-based like the reference's type-stable structs
    def __hash__(self):
        return hash((self.fn, self.args, tuple(sorted(self.kwargs.items()))))

    def __eq__(self, other):
        return (
            isinstance(other, ManipulatedFunction)
            and self.fn == other.fn
            and self.args == other.args
            and self.kwargs == other.kwargs
        )

    def __repr__(self):
        bound = ", ".join(map(repr, self.args))
        return f"{getattr(self.fn, '__name__', self.fn)}({bound}, ...)"


def pipeable(fn) -> ManipulatedFunction:
    """Wrap a function so ``fn | (a, b)`` binds leading arguments."""
    return ManipulatedFunction(fn)
