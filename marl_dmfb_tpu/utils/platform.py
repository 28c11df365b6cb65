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
    enable_compile_cache()


def enable_compile_cache(path: str = "") -> None:
    """Persistent XLA compilation cache — first compile of the fused rollout
    is minutes on a tunneled TPU; later processes load it in seconds."""
    import jax

    cache_dir = path or os.environ.get(
        "MARL_DMFB_COMPILE_CACHE",
        os.path.expanduser("~/.cache/marl_dmfb_tpu/xla"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
