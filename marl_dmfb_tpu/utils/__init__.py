"""Shared utilities."""

from marl_dmfb_tpu.utils.platform import apply_platform_env

__all__ = ["apply_platform_env"]
# benchmarking helpers import jax; pull them via
# `from marl_dmfb_tpu.utils.benchmarking import hostread, timeit_chained`
