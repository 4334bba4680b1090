"""Random number generation.

Counter-based ``jax.random`` keys threaded explicitly, replacing the
reference's hidden module-global ``numpy.random.default_rng()``
(``fast/funcs.py:21``, swapped by ``Fast.set_seed`` at ``fast/fast.py:768``).
Bit-compatibility with NumPy streams is impossible; parity with the
reference is statistical (SURVEY.md §7 design stance).

The ``rbg`` implementation is substantially faster on TPU than the default
``threefry2x32`` and is exposed through the ``RNG`` config key for the hot
Monte Carlo path.
"""

import jax
import jax.numpy as jnp
import numpy as np


def make_key(seed=None, impl="threefry"):
    """Create a PRNG key; fresh OS entropy when ``seed`` is None."""
    if seed is None:
        seed = int(np.random.SeedSequence().generate_state(1)[0])
    impl = {"threefry": "threefry2x32", "rbg": "rbg"}.get(impl, impl)
    return jax.random.key(seed, impl=impl)


def complex_normal(key, shape, dtype=jnp.complex64):
    """Standard complex normal: unit-variance real and imaginary parts.

    Matches the reference's coefficient statistics
    (``fast/funcs.py:352-356``): ``N(0,1) + 1j N(0,1)`` per element.
    """
    rdtype = jnp.float32 if dtype == jnp.complex64 else jnp.float64
    both = jax.random.normal(key, (2,) + tuple(shape), dtype=rdtype)
    return jax.lax.complex(both[0], both[1])
