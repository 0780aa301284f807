"""Shared backend gate for the Pallas TPU kernels.

Every `use_*` predicate in this package needs the same check: is the
default JAX backend actually a TPU (so a Mosaic-TPU kernel can lower),
and — when tests pin `jax_default_device` to a CPU device while a TPU
plugin is also registered — does the default *device* agree? One
definition here keeps the five kernel modules' gates from drifting.
"""

import jax


def tpu_backend_available() -> bool:
    """True iff jitted code will land on a TPU by default.

    Any introspection failure counts as "no TPU": the caller falls back
    to the pure-XLA formulation, which is always correct.
    """
    try:
        if jax.default_backend() in ('cpu', 'gpu'):
            return False
        default_dev = getattr(jax.config, 'jax_default_device', None)
        if default_dev is not None and \
                getattr(default_dev, 'platform', None) != 'tpu':
            return False
        return True
    except Exception:
        return False
