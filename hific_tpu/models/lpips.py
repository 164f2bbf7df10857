"""LPIPS perceptual metric in JAX (net-lin, AlexNet or VGG16 backbone).

Architecture spec from reference
src/loss/perceptual_similarity/networks_basic.py:24-108 and
pretrained_networks.py: frozen backbone features at 5 taps, per-layer
unit-normalization over channels, squared diffs, learned 1x1 "lin" heads,
spatial average, sum over layers. Inputs in [-1,1] (or [0,1] with
normalize=True, reference perceptual_loss.py:13-40).

The backbone/lin weights are NOT trained here; they are loaded from torch
checkpoints via `load_torch_lpips_weights` (torchvision backbone + the
reference's shipped lin weights). Gradients flow *through* LPIPS to the
reconstruction but never into its parameters — keep `lpips_params` out of
the optimizer pytree.
"""

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


def _max_pool(x, window=3, stride=2):
    """torch MaxPool2d(3, 2) equivalent (no padding, floor division)."""
    return nn.max_pool(x, (window, window), strides=(stride, stride),
                       padding="VALID")


class AlexNetFeatures(nn.Module):
    """torchvision AlexNet `.features` with taps after each ReLU
    (pretrained_networks.py alexnet slices)."""

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
            n0 = f0 * jax.lax.rsqrt(
                jnp.sum(f0 * f0, axis=-1, keepdims=True) + self.eps ** 2)
            n1 = f1 * jax.lax.rsqrt(
                jnp.sum(f1 * f1, axis=-1, keepdims=True) + self.eps ** 2)
            diff = (n0 - n1) ** 2
            w = self.param(f"lin{k}", nn.initializers.ones, (chns[k],),
                           jnp.float32)
            # 1x1 conv with non-negative weights == weighted channel sum.
            lin_out = jnp.sum(diff * jnp.maximum(w, 0.0), axis=-1, keepdims=True)
            val = val + jnp.mean(lin_out, axis=(1, 2), keepdims=True)
        return val


def load_torch_lpips_weights(lpips_params, lin_path: str,
                             backbone_state: Optional[dict] = None,
                             net: str = "alex"):
    """Populate LPIPS params from torch checkpoints.

    lin_path: the reference's shipped `{alex,vgg}.pth` lin-head weights
        (src/loss/perceptual_similarity/weights/v0.1/).
    backbone_state: a torchvision backbone `.features` state_dict (optional,
        e.g. extracted from `torchvision.models.alexnet(pretrained=True)`);
        without it the backbone stays at its current (random) init and the
        metric is architecture-complete but not perceptually calibrated.
    """
    import torch

    params = jax.tree_util.tree_map(np.asarray, lpips_params)

    lin_sd = torch.load(lin_path, map_location="cpu", weights_only=True)
    for k in range(5):
        w = lin_sd[f"lin{k}.model.1.weight"].numpy()  # (1, C, 1, 1)
        params[f"lin{k}"] = w.reshape(-1).astype(np.float32)

    if backbone_state is not None:
        conv_names = (
            ["conv1", "conv2", "conv3", "conv4", "conv5"]
            if net == "alex"
            else [f"conv{i}" for i in range(13)]
        )
        if net == "alex":
            torch_idx = [0, 3, 6, 8, 10]
        else:
            torch_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
        for name, ti in zip(conv_names, torch_idx):
            w = np.asarray(backbone_state[f"{ti}.weight"])  # (O,I,kh,kw)
            b = np.asarray(backbone_state[f"{ti}.bias"])
            params["backbone"][name]["kernel"] = w.transpose(2, 3, 1, 0).astype(
                np.float32)
            params["backbone"][name]["bias"] = b.astype(np.float32)

    return jax.tree_util.tree_map(jnp.asarray, params)
