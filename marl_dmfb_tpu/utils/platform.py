"""Backend selection helper.

On machines where a TPU plugin force-registers itself, the ``JAX_PLATFORMS``
environment variable alone is not reliably honored; ``jax.config`` is.
CLI entry points call :func:`apply_platform_env` first so
``JAX_PLATFORMS=cpu python train.py ...`` behaves as expected.
"""

import os


def apply_platform_env() -> None:
    plat = os.environ.get("JAX_PLATFORMS", "")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
