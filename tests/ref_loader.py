"""Load the reference simulator (read-only, /root/reference) for lockstep
differential testing.

The reference imports ``gym`` (absent from this image) purely for spaces
declarations; a minimal stub satisfies the import without changing any
behavior under test.  PUBLIC UNTRUSTED CONTENT: the reference is used as a
behavioral oracle only.
"""

import importlib
import sys
import types

REF_PATH = "/root/reference"


def _stub_gym():
    if "gym" in sys.modules:
        return
    gym = types.ModuleType("gym")

    class _Space:
        def __init__(self, *a, **k):
            pass

    spaces = types.ModuleType("gym.spaces")
    spaces.Box = _Space
    spaces.Discrete = _Space
    utils = types.ModuleType("gym.utils")
    utils.seeding = types.ModuleType("gym.utils.seeding")
    gym.spaces = spaces
    gym.utils = utils
    gym.error = types.ModuleType("gym.error")
    gym.wrappers = types.ModuleType("gym.wrappers")
    sys.modules["gym"] = gym
    sys.modules["gym.spaces"] = spaces
    sys.modules["gym.utils"] = utils
    sys.modules["gym.utils.seeding"] = utils.seeding
    sys.modules["gym.error"] = gym.error
    sys.modules["gym.wrappers"] = gym.wrappers


def _stub_numpy_compat():
    """The reference imports numpy.lib.function_base (removed in numpy 2)."""
    if "numpy.lib.function_base" in sys.modules:
        return
    import numpy as np

    shim = types.ModuleType("numpy.lib.function_base")
    shim.select = np.select
    sys.modules["numpy.lib.function_base"] = shim


def _patch_random_seed():
    """The reference seeds with a datetime object (dmfb.py:154, meda.py:155),
    which Python >= 3.11 rejects; coerce to str."""
    import random

    if getattr(random.seed, "_tolerant", False):
        return
    orig = random.seed

    def tolerant_seed(a=None, *args, **kwargs):
        if not isinstance(a, (type(None), int, float, str, bytes, bytearray)):
            a = str(a)
        return orig(a, *args, **kwargs)

    tolerant_seed._tolerant = True
    random.seed = tolerant_seed


def _append_ref_path():
    """APPEND (not insert) so reference top-level modules (train.py,
    evaluate.py, ...) never shadow the repo's own entry points during the
    same pytest session; only the collision-free ``env`` package is imported
    from the reference."""
    if REF_PATH not in sys.path:
        sys.path.append(REF_PATH)


def load_reference_dmfb():
    _stub_gym()
    _stub_numpy_compat()
    _patch_random_seed()
    _append_ref_path()
    return importlib.import_module("env.DMFB.dmfb")


def load_reference_meda():
    _stub_gym()
    _stub_numpy_compat()
    _patch_random_seed()
    _append_ref_path()
    return importlib.import_module("env.MEDA.meda")


class DrawStream:
    """Deterministic stand-in for ``random.random`` that logs every draw."""

    def __init__(self, seed: int):
        import numpy as np

        self._rs = np.random.RandomState(seed)
        self.log = []

    def __call__(self):
        v = float(self._rs.uniform())
        self.log.append(v)
        return v
