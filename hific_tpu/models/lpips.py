"""LPIPS perceptual metric in JAX (net-lin, AlexNet or VGG16 backbone).

Architecture spec from reference
src/loss/perceptual_similarity/networks_basic.py:24-108 and
pretrained_networks.py: frozen backbone features at 5 taps, per-layer
unit-normalization over channels (perceptual_loss.py:42-46:
``f / sqrt(sum(f^2, C) + 1e-10)``), squared diffs, learned 1x1 "lin" heads,
spatial average, sum over layers. Inputs in [-1,1] (or [0,1] with
normalize=True, reference perceptual_loss.py:25-39).

The lin weights are applied RAW, exactly as PNetLin does at eval
(networks_basic.py:75); the non-negativity of the shipped weights comes
from a training-time projection (dist_model.py:123-126), not an eval-time
clamp.

The backbone/lin weights are NOT trained here. The calibrated lin heads
(v0.1 release of the LPIPS project) ship with this package as an npz asset
and load by default via `default_lpips_params`. The AlexNet/VGG backbone
weights come from a torchvision state_dict (`--lpips_backbone_path`), from
a converted reference HiFiC checkpoint (which embeds them,
`lpips_params_from_reference_state`), or — explicitly uncalibrated — from a
seeded random init. Gradients flow *through* LPIPS to the reconstruction
but never into its parameters — keep `lpips_params` out of the optimizer
pytree.
"""

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

# ImageNet scaling constants (networks_basic.py:91-98).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

ALEX_CHNS = (64, 192, 384, 256, 256)
VGG_CHNS = (64, 128, 256, 512, 512)

ASSETS_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "assets")


def _max_pool(x, window=3, stride=2):
    """torch MaxPool2d(3, 2) equivalent (no padding, floor division)."""
    return nn.max_pool(x, (window, window), strides=(stride, stride),
                       padding="VALID")


class AlexNetFeatures(nn.Module):
    """torchvision AlexNet `.features` with taps after each ReLU
    (pretrained_networks.py alexnet slices: features[0:2], [2:5], [5:8],
    [8:10], [10:12])."""

    @nn.compact
    def __call__(self, x):
        taps = []
        x = nn.Conv(64, (11, 11), strides=(4, 4), padding=((2, 2), (2, 2)),
                    name="conv1")(x)
        x = jax.nn.relu(x)
        taps.append(x)
        x = _max_pool(x)
        x = nn.Conv(192, (5, 5), padding=((2, 2), (2, 2)), name="conv2")(x)
        x = jax.nn.relu(x)
        taps.append(x)
        x = _max_pool(x)
        x = nn.Conv(384, (3, 3), padding=((1, 1), (1, 1)), name="conv3")(x)
        x = jax.nn.relu(x)
        taps.append(x)
        x = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), name="conv4")(x)
        x = jax.nn.relu(x)
        taps.append(x)
        x = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), name="conv5")(x)
        x = jax.nn.relu(x)
        taps.append(x)
        return taps


class VGG16Features(nn.Module):
    """torchvision VGG16 `.features` tapped at relu1_2/2_2/3_3/4_3/5_3."""

    @nn.compact
    def __call__(self, x):
        cfg = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
        taps = []
        idx = 0
        for block, (ch, n_convs) in enumerate(cfg):
            for _ in range(n_convs):
                x = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)),
                            name=f"conv{idx}")(x)
                x = jax.nn.relu(x)
                idx += 1
            taps.append(x)
            if block < 4:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


class LPIPS(nn.Module):
    """net-lin LPIPS distance. Call with two NHWC images."""

    net: str = "alex"  # 'alex' | 'vgg'
    eps: float = 1e-10

    @nn.compact
    def __call__(self, in0, in1, normalize: bool = False):
        """Returns per-image LPIPS distance, shape (N, 1, 1, 1)."""
        if normalize:  # [0,1] -> [-1,1]
            in0 = 2.0 * in0 - 1.0
            in1 = 2.0 * in1 - 1.0

        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        in0 = (in0 - shift) / scale
        in1 = (in1 - shift) / scale

        backbone = {"alex": AlexNetFeatures, "vgg": VGG16Features}[self.net](
            name="backbone")
        chns = {"alex": ALEX_CHNS, "vgg": VGG_CHNS}[self.net]

        feats0 = backbone(in0)
        feats1 = backbone(in1)

        val = 0.0
        for k, (f0, f1) in enumerate(zip(feats0, feats1)):
            # normalize_tensor (perceptual_loss.py:42-46): eps INSIDE the
            # sqrt, added to the squared norm.
            n0 = f0 * jax.lax.rsqrt(
                jnp.sum(f0 * f0, axis=-1, keepdims=True) + self.eps)
            n1 = f1 * jax.lax.rsqrt(
                jnp.sum(f1 * f1, axis=-1, keepdims=True) + self.eps)
            diff = (n0 - n1) ** 2
            w = self.param(f"lin{k}", nn.initializers.ones, (chns[k],),
                           jnp.float32)
            # 1x1 bias-free conv == weighted channel sum (networks_basic.py:
            # 101-108); weights used raw, as at reference eval time.
            lin_out = jnp.sum(diff * w, axis=-1, keepdims=True)
            val = val + jnp.mean(lin_out, axis=(1, 2), keepdims=True)
        return val


class Dist2LogitLayer(nn.Module):
    """Maps two per-image LPIPS distances to a [0,1] preference score
    (reference networks_basic.py:111-126): 1x1 conv MLP over the feature
    vector (d0, d1, d0-d1, d0/(d1+eps), d1/(d0+eps))."""

    chn_mid: int = 32
    use_sigmoid: bool = True

    @nn.compact
    def __call__(self, d0, d1, eps: float = 0.1):
        x = jnp.concatenate(
            [d0, d1, d0 - d1, d0 / (d1 + eps), d1 / (d0 + eps)], axis=-1)
        x = nn.Dense(self.chn_mid, name="fc0")(x)   # 1x1 convs == dense
        x = jax.nn.leaky_relu(x, 0.2)
        x = nn.Dense(self.chn_mid, name="fc1")(x)
        x = jax.nn.leaky_relu(x, 0.2)
        x = nn.Dense(1, name="fc2")(x)
        return jax.nn.sigmoid(x) if self.use_sigmoid else x


def bce_ranking_loss(logit, judge):
    """BCERankingLoss (networks_basic.py:128-138): binary cross-entropy of
    the Dist2Logit preference against human 2AFC judgements in [-1, 1]
    (mapped to [0,1]). `logit` is the SIGMOID output, as in the reference
    (torch.nn.BCELoss on probabilities)."""
    per = (judge + 1.0) / 2.0
    eps = 1e-12
    return -jnp.mean(per * jnp.log(logit + eps)
                     + (1.0 - per) * jnp.log(1.0 - logit + eps))


def load_torch_dist2logit_weights(params, torch_state):
    """Map the reference Dist2LogitLayer state_dict (model.{0,2,4} 1x1
    convs) onto Dist2LogitLayer params."""
    out = jax.tree_util.tree_map(np.asarray, params)
    for ours, theirs in [("fc0", "model.0"), ("fc1", "model.2"),
                         ("fc2", "model.4")]:
        w = np.asarray(torch_state[f"{theirs}.weight"])  # (O, I, 1, 1)
        b = np.asarray(torch_state[f"{theirs}.bias"])
        out[ours]["kernel"] = w.reshape(w.shape[0], w.shape[1]).T.astype(
            np.float32)
        out[ours]["bias"] = b.astype(np.float32)
    return jax.tree_util.tree_map(jnp.asarray, out)


# --------------------------------------------------------------------------
# Weight loading
# --------------------------------------------------------------------------

def _backbone_conv_map(net: str):
    """(our conv name, torchvision `.features` index) pairs."""
    if net == "alex":
        return list(zip(["conv1", "conv2", "conv3", "conv4", "conv5"],
                        [0, 3, 6, 8, 10]))
    return list(zip([f"conv{i}" for i in range(13)],
                    [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]))

# torchvision feature index per tap slice in the reference's alexnet wrapper
# (pretrained_networks.py:56-80): sliceK.<features idx>.
_ALEX_SLICE_IDX = [(1, 0), (2, 3), (3, 6), (4, 8), (5, 10)]
_VGG_SLICE_IDX = [(1, 0), (1, 2), (2, 5), (2, 7), (3, 10), (3, 12), (3, 14),
                  (4, 17), (4, 19), (4, 21), (5, 24), (5, 26), (5, 28)]


def default_lpips_params(net: str = "alex",
                         backbone_state: Optional[dict] = None,
                         backbone_seed: int = 0):
    """LPIPS params with the packaged calibrated lin heads.

    backbone_state: torchvision `.features` state_dict ({idx}.weight /
        {idx}.bias, numpy or torch tensors). When None the backbone is a
        seeded random init — architecture-exact but NOT perceptually
        calibrated (callers should surface that).
    """
    lpips = LPIPS(net=net)
    dummy = jnp.zeros((1, 64, 64, 3))
    params = lpips.init(jax.random.PRNGKey(backbone_seed), dummy, dummy)[
        "params"]
    params = jax.tree_util.tree_map(np.asarray, params)

    lin_asset = os.path.join(ASSETS_DIR, f"lpips_lin_{net}.npz")
    with np.load(lin_asset) as lin:
        for k in range(5):
            params[f"lin{k}"] = lin[f"lin{k}"].astype(np.float32)

    if backbone_state is not None:
        _load_backbone(params, backbone_state, net)
    return jax.tree_util.tree_map(jnp.asarray, params)


def _load_backbone(params, backbone_state, net):
    for name, ti in _backbone_conv_map(net):
        w = np.asarray(backbone_state[f"{ti}.weight"])  # (O,I,kh,kw)
        b = np.asarray(backbone_state[f"{ti}.bias"])
        params["backbone"][name]["kernel"] = w.transpose(2, 3, 1, 0).astype(
            np.float32)
        params["backbone"][name]["bias"] = b.astype(np.float32)


def load_torch_lpips_weights(lpips_params, lin_path: str,
                             backbone_state: Optional[dict] = None,
                             net: str = "alex"):
    """Populate LPIPS params from torch checkpoints.

    lin_path: `{alex,vgg}.pth` lin-head weights in the LPIPS v0.1 release
        layout (keys `lin{k}.model.1.weight`, shape (1, C, 1, 1)).
    backbone_state: a torchvision backbone `.features` state_dict (optional);
        without it the backbone stays at its current init.
    """
    import torch

    params = jax.tree_util.tree_map(np.asarray, lpips_params)

    lin_sd = torch.load(lin_path, map_location="cpu", weights_only=True)
    for k in range(5):
        w = lin_sd[f"lin{k}.model.1.weight"].numpy()  # (1, C, 1, 1)
        params[f"lin{k}"] = w.reshape(-1).astype(np.float32)

    if backbone_state is not None:
        _load_backbone(params, backbone_state, net)

    return jax.tree_util.tree_map(jnp.asarray, params)


def lpips_params_from_reference_state(state_dict, net: str = "alex",
                                      prefix: str = "perceptual_loss.model.net."):
    """Extract calibrated LPIPS params embedded in a reference HiFiC
    checkpoint.

    The reference Model registers PerceptualLoss as a submodule
    (src/model.py), so full `.pt` checkpoints carry both the backbone
    (`{prefix}net.slice{K}.{i}.weight`) and the lin heads
    (`{prefix}lin{k}.model.1.weight`). Returns None if the keys are absent.
    """
    slice_idx = _ALEX_SLICE_IDX if net == "alex" else _VGG_SLICE_IDX
    probe = f"{prefix}lin0.model.1.weight"
    keys = {k: v for k, v in state_dict.items() if k.startswith(prefix)}
    if probe not in keys:
        return None

    lpips = LPIPS(net=net)
    dummy = jnp.zeros((1, 64, 64, 3))
    params = lpips.init(jax.random.PRNGKey(0), dummy, dummy)["params"]
    params = jax.tree_util.tree_map(np.asarray, params)

    for k in range(5):
        w = np.asarray(keys[f"{prefix}lin{k}.model.1.weight"])
        params[f"lin{k}"] = w.reshape(-1).astype(np.float32)
    conv_names = [n for n, _ in _backbone_conv_map(net)]
    for name, (sl, fi) in zip(conv_names, slice_idx):
        w = np.asarray(keys[f"{prefix}net.slice{sl}.{fi}.weight"])
        b = np.asarray(keys[f"{prefix}net.slice{sl}.{fi}.bias"])
        params["backbone"][name]["kernel"] = w.transpose(2, 3, 1, 0).astype(
            np.float32)
        params["backbone"][name]["bias"] = b.astype(np.float32)
    return jax.tree_util.tree_map(jnp.asarray, params)


def build_lpips_fn(net: str = "alex", lin_path: Optional[str] = None,
                   backbone_path: Optional[str] = None,
                   params_npz: Optional[str] = None,
                   backbone_seed: int = 0):
    """Construct an LPIPS callable for training/eval.

    Weight sources, in precedence order:
      params_npz      — full param snapshot (e.g. extracted by the convert
                        CLI from a reference checkpoint); fully calibrated.
      backbone_path   — torch `.features` state_dict for the backbone,
                        combined with lin heads from `lin_path` or the
                        packaged asset.
      (neither)       — packaged lin heads + seeded random backbone:
                        architecture-exact but NOT perceptually calibrated.

    Returns (apply_fn, calibrated). apply_fn(x0, x1, normalize=False) maps
    NHWC images to per-image distances, shape (N, 1, 1, 1).
    """
    lpips = LPIPS(net=net)
    if params_npz is not None:
        params = load_lpips_npz(params_npz)
        calibrated = True
    else:
        backbone_state = None
        if backbone_path is not None:
            import torch

            backbone_state = torch.load(backbone_path, map_location="cpu",
                                        weights_only=True)
            if hasattr(backbone_state, "state_dict"):  # whole module saved
                backbone_state = backbone_state.state_dict()
        if lin_path is not None:
            dummy = jnp.zeros((1, 64, 64, 3))
            params = lpips.init(jax.random.PRNGKey(backbone_seed), dummy,
                                dummy)["params"]
            params = load_torch_lpips_weights(params, lin_path,
                                              backbone_state, net=net)
        else:
            params = default_lpips_params(net=net,
                                          backbone_state=backbone_state,
                                          backbone_seed=backbone_seed)
        calibrated = backbone_state is not None

    def apply_fn(x0, x1, normalize=False):
        return lpips.apply({"params": params}, x0, x1, normalize=normalize)

    return apply_fn, calibrated


def save_lpips_npz(path: str, params) -> None:
    """Flat npz snapshot of a full LPIPS param tree (portable, no torch)."""
    import flax.traverse_util as tu

    flat = {"/".join(k): np.asarray(v)
            for k, v in tu.flatten_dict(
                jax.tree_util.tree_map(np.asarray, params)).items()}
    np.savez(path, **flat)


def load_lpips_npz(path: str):
    import flax.traverse_util as tu

    with np.load(path) as data:
        flat = {tuple(k.split("/")): jnp.asarray(data[k]) for k in data.files}
    return tu.unflatten_dict(flat)
