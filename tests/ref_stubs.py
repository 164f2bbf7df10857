"""Functional stand-ins for the reference tree's optional deps.

The reference's vectorized coder uses `autograd.make_vjp` + `vspace` purely
as a masked-gather/scatter mechanism (compression_utils.py:82-91:
view_update). These minimal implementations reproduce exactly that
behavior for pure-gather view functions, so the reference's masked
overflow encode/decode paths run as a test oracle without autograd.
"""

import sys
import types

import numpy as np


class _VSpace:
    def __init__(self, x):
        arr = np.asarray(x)
        self.shape = arr.shape
        self.dtype = arr.dtype

    def __eq__(self, other):
        return self.shape == other.shape and self.dtype == other.dtype

    @staticmethod
    def add(a, b):
        return a + b

    @staticmethod
    def scalar_mul(a, s):
        return a * s


def _vspace(x):
    return _VSpace(x)


def _make_vjp(view_fun):
    """VJP of a pure gather: scatter the cotangent back to the gathered
    positions (zeros elsewhere). Gather indices are recovered by running
    the view over an arange — valid for any indexing-only view_fun."""

    def vjp_maker(data):
        data = np.asarray(data)
        item = view_fun(data)
        probe = view_fun(np.arange(data.size, dtype=np.int64).reshape(
            data.shape))

        def vjp(g):
            out = np.zeros(data.size, dtype=np.asarray(g).dtype)
            out[np.asarray(probe).reshape(-1)] = np.asarray(g).reshape(-1)
            return out.reshape(data.shape)

        return vjp, item

    return vjp_maker


def install_reference_stubs():
    """Install (or upgrade in place) autograd/torchvision stubs so every
    reference code path used as an oracle runs. Idempotent; also patches
    already-imported reference modules that bound the names at import."""
    if "autograd" in sys.modules:
        autograd = sys.modules["autograd"]
    else:
        autograd = types.ModuleType("autograd")
        sys.modules["autograd"] = autograd
    autograd.numpy = np
    autograd.make_vjp = _make_vjp

    if "autograd.extend" in sys.modules:
        extend = sys.modules["autograd.extend"]
    else:
        extend = types.ModuleType("autograd.extend")
        sys.modules["autograd.extend"] = extend
    extend.vspace = _vspace
    extend.VSpace = _VSpace
    autograd.extend = extend
    sys.modules["autograd.numpy"] = np

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_utils = types.ModuleType("torchvision.utils")
        tv_utils.save_image = None
        tv.utils = tv_utils
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tv_utils
    # src/helpers/datasets.py imports transforms/datasets, and
    # pretrained_networks.py imports models, all at module scope; the
    # oracle tests never construct them (PerceptualLoss is monkeypatched),
    # so inert submodules suffice.
    tv = sys.modules["torchvision"]
    for sub in ("transforms", "datasets", "models"):
        name = f"torchvision.{sub}"
        if name not in sys.modules:
            mod = types.ModuleType(name)
            sys.modules[name] = mod
        setattr(tv, sub, sys.modules[name])
    # reference datasets.py subclasses these at class-definition time
    if not hasattr(sys.modules["torchvision.datasets"], "Cityscapes"):
        sys.modules["torchvision.datasets"].Cityscapes = object
    if not hasattr(sys.modules["torchvision.transforms"], "Compose"):
        sys.modules["torchvision.transforms"].Compose = \
            lambda ts: (lambda x: x)

    # src/helpers/datasets.py: `from skimage.io import imread` (only used
    # by dataset classes the tests never instantiate; route through PIL so
    # it would even work).
    if "skimage" not in sys.modules:
        import numpy as _np
        from PIL import Image as _Image

        sk = types.ModuleType("skimage")
        sk.__path__ = []  # mark as package so submodule imports resolve
        sk_io = types.ModuleType("skimage.io")
        sk_io.imread = lambda p: _np.asarray(_Image.open(p))
        sk_measure = types.ModuleType("skimage.measure")
        sk_measure.compare_ssim = None
        sk_transform = types.ModuleType("skimage.transform")
        sk_transform.resize = None
        sk_color = types.ModuleType("skimage.color")
        sk.io = sk_io
        sk.measure = sk_measure
        sk.transform = sk_transform
        sk.color = sk_color
        sys.modules["skimage"] = sk
        sys.modules["skimage.io"] = sk_io
        sys.modules["skimage.measure"] = sk_measure
        sys.modules["skimage.transform"] = sk_transform
        sys.modules["skimage.color"] = sk_color

    # Reference modules bind `make_vjp`/`vspace` at import time — upgrade
    # any that were imported against an older inert stub.
    for name, mod in list(sys.modules.items()):
        if name.startswith("src.") and mod is not None:
            if hasattr(mod, "make_vjp"):
                mod.make_vjp = _make_vjp
            if hasattr(mod, "vspace"):
                mod.vspace = _vspace
