"""Process-wide jit wrappers for flax module init/apply in tests.

jax.jit caches traces per *wrapper object*.  Two equal flax modules (frozen
config dataclasses, equal by value) constructed in different test modules
get different bound methods and therefore re-trace identical programs —
5-10s per tiny-UNet trace on the 1-core CI box.  Sharing one wrapper per
(module, method) makes every tiny-model init/apply trace at most once per
test process (and replay from the persistent compile cache across runs).

Semantics are identical to ``jax.jit(module.init)`` at each call site: the
wrapper re-traces per distinct argument shapes/dtypes as usual, and values
are computed per call.
"""

import jax

_MEMO = {}


def _wrapper(module, method):
    key = (module, method)
    if key not in _MEMO:
        _MEMO[key] = jax.jit(getattr(module, method))
    return _MEMO[key]


def jit_init(module):
    return _wrapper(module, "init")


def jit_apply(module):
    return _wrapper(module, "apply")
