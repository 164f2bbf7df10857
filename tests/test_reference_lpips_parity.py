"""Numerical parity of the JAX LPIPS vs the reference PNetLin
(src/loss/perceptual_similarity/networks_basic.py:24-108).

The calibrated AlexNet/VGG backbones (torchvision pretrained) are not
available offline, so parity is proven with MATCHED RANDOM backbone weights
injected on both sides — this checks every piece of math (scaling layer,
feature taps, unit-normalization, lin heads, spatial average, layer sum);
calibration is then just a weight load, which `lpips_params_from_reference_
state` and `default_lpips_params` cover and which is tested for exact
round-tripping below.
"""

import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"
LIN_WEIGHTS = os.path.join(
    REFERENCE, "src/loss/perceptual_similarity/weights/v0.1")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "src")),
    reason="reference tree not mounted")

torch = pytest.importorskip("torch")


def _alexnet_features():
    import torch.nn as tnn

    return tnn.Sequential(
        tnn.Conv2d(3, 64, 11, stride=4, padding=2), tnn.ReLU(inplace=True),
        tnn.MaxPool2d(3, 2),
        tnn.Conv2d(64, 192, 5, padding=2), tnn.ReLU(inplace=True),
        tnn.MaxPool2d(3, 2),
        tnn.Conv2d(192, 384, 3, padding=1), tnn.ReLU(inplace=True),
        tnn.Conv2d(384, 256, 3, padding=1), tnn.ReLU(inplace=True),
        tnn.Conv2d(256, 256, 3, padding=1), tnn.ReLU(inplace=True),
        tnn.MaxPool2d(3, 2),
    )


def _vgg16_features():
    import torch.nn as tnn

    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    layers, in_ch = [], 3
    for v in cfg:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers += [tnn.Conv2d(in_ch, v, 3, padding=1),
                       tnn.ReLU(inplace=True)]
            in_ch = v
    return tnn.Sequential(*layers)


@pytest.fixture(scope="module")
def ref_lpips():
    """Import the reference LPIPS package with torchvision/skimage stubbed
    (torchvision models return hand-built, randomly-initialized feature
    stacks — the exact torchvision layouts)."""

    class _Backbone(torch.nn.Module):
        def __init__(self, features):
            super().__init__()
            self.features = features

    def _make_models():
        m = types.ModuleType("torchvision.models")
        m.alexnet = lambda pretrained=True: _Backbone(_alexnet_features())
        m.vgg16 = lambda pretrained=True: _Backbone(_vgg16_features())
        m.squeezenet1_1 = lambda pretrained=True: (_ for _ in ()).throw(
            NotImplementedError)
        return m

    stubs = {
        "torchvision": {"models": None, "utils": None},
        "torchvision.models": None,
        "torchvision.utils": {"save_image": None},
        "skimage": {"color": None, "transform": None, "measure": None},
        "skimage.color": {"rgb2lab": None},
        "skimage.transform": {},
        "skimage.measure": {"compare_ssim": None},
        "autograd": {"numpy": np, "make_vjp": None},
        "autograd.extend": {"vspace": None, "VSpace": object},
    }
    for name, attrs in stubs.items():
        if name == "torchvision.models":
            # ref_stubs.install() (other reference-parity tests) may have
            # planted a bare torchvision.models first; upgrade it in place
            # with the backbone constructors this module needs
            existing = sys.modules.get(name)
            if existing is None:
                sys.modules[name] = _make_models()
            elif not hasattr(existing, "alexnet"):
                rich = _make_models()
                for k in ("alexnet", "vgg16", "squeezenet1_1"):
                    setattr(existing, k, getattr(rich, k))
            continue
        if name in sys.modules:
            continue
        mod = types.ModuleType(name)
        for k, v in (attrs or {}).items():
            setattr(mod, k, v)
        sys.modules[name] = mod
    sys.modules["torchvision"].models = sys.modules["torchvision.models"]
    sys.modules["torchvision"].utils = sys.modules["torchvision.utils"]
    sys.modules["skimage"].measure = sys.modules["skimage.measure"]
    sys.modules["skimage"].color = sys.modules["skimage.color"]
    sys.modules["skimage"].transform = sys.modules["skimage.transform"]
    sys.modules["autograd"].extend = sys.modules["autograd.extend"]

    sys.path.insert(0, REFERENCE)
    try:
        from src.loss.perceptual_similarity import networks_basic
    finally:
        sys.path.remove(REFERENCE)
    return networks_basic


def _torch_features_state(pnl):
    """Rebuild a torchvision-style `.features` state_dict ({idx}.weight)
    from the reference wrapper's slices."""
    sd = {}
    for k, v in pnl.net.state_dict().items():
        # sliceS.I.weight -> I.weight (I is the torchvision features index)
        _, idx, leaf = k.split(".")
        sd[f"{idx}.{leaf}"] = v.numpy()
    return sd


@pytest.mark.parametrize("net", ["alex", "vgg"])
def test_pnetlin_parity_shipped_lin_weights(ref_lpips, net):
    """Matched random backbone + the shipped calibrated lin heads on both
    sides: reference PNetLin == JAX LPIPS to 1e-5."""
    import jax
    import jax.numpy as jnp

    from hific_tpu.models.lpips import LPIPS, load_torch_lpips_weights

    torch.manual_seed(0)
    pnl = ref_lpips.PNetLin(pnet_type=net, pnet_rand=True, use_dropout=True,
                            spatial=False, version="0.1", lpips=True)
    lin_sd = torch.load(os.path.join(LIN_WEIGHTS, f"{net}.pth"),
                        map_location="cpu", weights_only=True)
    missing, unexpected = pnl.load_state_dict(lin_sd, strict=False)
    assert not unexpected
    pnl.eval()

    rng = np.random.RandomState(1)
    x0 = rng.uniform(-1, 1, size=(2, 3, 64, 64)).astype(np.float32)
    x1 = np.clip(x0 + rng.uniform(-0.2, 0.2, size=x0.shape), -1, 1).astype(
        np.float32)
    with torch.no_grad():
        want = pnl(torch.from_numpy(x0), torch.from_numpy(x1)).numpy()

    lpips = LPIPS(net=net)
    params = lpips.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)))[
        "params"]
    params = load_torch_lpips_weights(
        params, os.path.join(LIN_WEIGHTS, f"{net}.pth"),
        backbone_state=_torch_features_state(pnl), net=net)
    got = lpips.apply({"params": params},
                      jnp.asarray(x0.transpose(0, 2, 3, 1)),
                      jnp.asarray(x1.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).reshape(-1),
                               want.reshape(-1), atol=1e-5, rtol=1e-4)


def test_pnetlin_parity_normalize_path(ref_lpips):
    """[0,1] inputs + normalize=True (the training call, reference
    perceptual_loss.py:25-39 scales to [-1,1])."""
    import jax.numpy as jnp

    from hific_tpu.models.lpips import LPIPS, default_lpips_params

    torch.manual_seed(2)
    pnl = ref_lpips.PNetLin(pnet_type="alex", pnet_rand=True,
                            use_dropout=True, version="0.1", lpips=True)
    lin_sd = torch.load(os.path.join(LIN_WEIGHTS, "alex.pth"),
                        map_location="cpu", weights_only=True)
    pnl.load_state_dict(lin_sd, strict=False)
    pnl.eval()

    rng = np.random.RandomState(3)
    x0 = rng.uniform(0, 1, size=(3, 3, 96, 96)).astype(np.float32)
    x1 = np.clip(x0 + rng.normal(0, 0.05, x0.shape), 0, 1).astype(np.float32)
    with torch.no_grad():
        want = pnl(torch.from_numpy(2 * x0 - 1),
                   torch.from_numpy(2 * x1 - 1)).numpy()

    params = default_lpips_params(
        net="alex", backbone_state=_torch_features_state(pnl))
    got = LPIPS(net="alex").apply({"params": params},
                                  jnp.asarray(x0.transpose(0, 2, 3, 1)),
                                  jnp.asarray(x1.transpose(0, 2, 3, 1)),
                                  normalize=True)
    np.testing.assert_allclose(np.asarray(got).reshape(-1),
                               want.reshape(-1), atol=1e-5, rtol=1e-4)


def test_lpips_extraction_from_reference_checkpoint(ref_lpips):
    """A reference HiFiC `.pt` embeds PerceptualLoss weights; extraction
    must reproduce PNetLin exactly."""
    import jax.numpy as jnp

    from hific_tpu.models.lpips import LPIPS, lpips_params_from_reference_state

    torch.manual_seed(4)
    pnl = ref_lpips.PNetLin(pnet_type="alex", pnet_rand=True,
                            use_dropout=True, version="0.1", lpips=True)
    pnl.eval()

    prefix = "perceptual_loss.model.net."
    sd = {prefix + k: v.numpy() for k, v in pnl.state_dict().items()}
    params = lpips_params_from_reference_state(sd, net="alex")
    assert params is not None

    rng = np.random.RandomState(5)
    x0 = rng.uniform(-1, 1, size=(1, 3, 64, 64)).astype(np.float32)
    x1 = rng.uniform(-1, 1, size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = pnl(torch.from_numpy(x0), torch.from_numpy(x1)).numpy()
    got = LPIPS(net="alex").apply({"params": params},
                                  jnp.asarray(x0.transpose(0, 2, 3, 1)),
                                  jnp.asarray(x1.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).reshape(-1),
                               want.reshape(-1), atol=1e-5, rtol=1e-4)

    # absent keys -> None (graceful on R&D-only checkpoints)
    assert lpips_params_from_reference_state({"Encoder.x": 0}) is None


def test_packaged_lin_assets_match_shipped_pth():
    """The vendored npz assets must be exactly the v0.1 release weights."""
    from hific_tpu.models.lpips import ASSETS_DIR

    for net in ("alex", "vgg"):
        sd = torch.load(os.path.join(LIN_WEIGHTS, f"{net}.pth"),
                        map_location="cpu", weights_only=True)
        with np.load(os.path.join(ASSETS_DIR, f"lpips_lin_{net}.npz")) as got:
            for k in range(5):
                want = sd[f"lin{k}.model.1.weight"].numpy().reshape(-1)
                np.testing.assert_array_equal(got[f"lin{k}"], want)


def test_dist2logit_and_bce_ranking_parity(ref_lpips):
    """LPIPS training extras (2AFC ranking head): Dist2LogitLayer +
    BCERankingLoss match the reference (networks_basic.py:111-138)."""
    import jax
    import jax.numpy as jnp

    from hific_tpu.models.lpips import (
        Dist2LogitLayer,
        bce_ranking_loss,
        load_torch_dist2logit_weights,
    )

    torch.manual_seed(6)
    r_loss = ref_lpips.BCERankingLoss(chn_mid=32)
    r_loss.eval()

    rng = np.random.RandomState(7)
    d0 = rng.uniform(0.01, 1.0, size=(6, 1, 1, 1)).astype(np.float32)
    d1 = rng.uniform(0.01, 1.0, size=(6, 1, 1, 1)).astype(np.float32)
    judge = rng.choice([-1.0, 0.0, 1.0], size=(6, 1, 1, 1)).astype(
        np.float32)

    with torch.no_grad():
        want_loss = float(r_loss(torch.from_numpy(d0), torch.from_numpy(d1),
                                 torch.from_numpy(judge)))
        want_logit = r_loss.logit.numpy()

    layer = Dist2LogitLayer(chn_mid=32)
    p = layer.init(jax.random.PRNGKey(0), jnp.asarray(d0), jnp.asarray(d1))[
        "params"]
    p = load_torch_dist2logit_weights(p, r_loss.net.state_dict())
    got_logit = layer.apply({"params": p}, jnp.asarray(d0), jnp.asarray(d1))
    np.testing.assert_allclose(np.asarray(got_logit).reshape(-1),
                               want_logit.reshape(-1), atol=1e-6)
    got_loss = float(bce_ranking_loss(got_logit, jnp.asarray(judge)))
    np.testing.assert_allclose(got_loss, want_loss, rtol=1e-5)
