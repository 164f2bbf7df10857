"""Convert reference PyTorch HiFiC checkpoints to hific_tpu param trees.

The reference saves `{'model_state_dict': ..., args...}` (src/helpers/
utils.py:125-167) with NCHW torch layouts. This maps every tensor to the
NHWC flax tree:

- Conv2d weight (O,I,kh,kw)          -> HWIO (kh,kw,I,O)
- ConvTranspose2d weight (I,O,kh,kw) -> spatially flipped HWIO with I/O in
  input/output position (our ConvTranspose runs an input-dilated
  CORRELATION, the exact adjoint of torch's transposed convolution)
- ChannelNorm gamma/beta (1,C,1,1)   -> (C,)
- HyperpriorDensity H_k/a_k/b_k      -> unchanged (C, f_out, f_in)
- spectral_norm weight_orig/weight_u -> SNConv kernel + `spectral/u` state

Name map keyed on the reference's module attribute names (encoder.py:56-101,
generator.py:98-142, hyper.py:45-130, discriminator.py:35-64,
hyperprior.py:167-174).
"""

from typing import Dict, Optional, Tuple

import numpy as np


def _conv(w):  # (O,I,kh,kw) -> (kh,kw,I,O)
    return np.asarray(w).transpose(2, 3, 1, 0)


def _convT(w):  # (I,O,kh,kw) -> flipped (kh,kw,I,O)
    w = np.asarray(w).transpose(2, 3, 0, 1)  # (kh,kw,I,O)
    return w[::-1, ::-1].copy()


def _norm(v):  # (1,C,1,1) -> (C,)
    return np.asarray(v).reshape(-1)


def _set(tree: Dict, path: str, value):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = np.asarray(value, np.float32)


def _conv_block(tree, sd, torch_prefix, jax_path, conv_idx=1, norm_idx=2,
                has_norm=True):
    """Sequential [pad, Conv2d, ChannelNorm, act] -> Conv module + Norm."""
    _set(tree, f"{jax_path}/Conv_0/kernel",
         _conv(sd[f"{torch_prefix}.{conv_idx}.weight"]))
    _set(tree, f"{jax_path}/Conv_0/bias", sd[f"{torch_prefix}.{conv_idx}.bias"])
    if has_norm:
        norm_path = jax_path.replace("conv_", "norm_").replace("conv", "norm")
        _set(tree, f"{norm_path}/gamma",
             _norm(sd[f"{torch_prefix}.{norm_idx}.gamma"]))
        _set(tree, f"{norm_path}/beta",
             _norm(sd[f"{torch_prefix}.{norm_idx}.beta"]))


def convert_state_dict(sd: Dict, n_residual_blocks: int = 9,
                       density_filters: int = 4,
                       has_discriminator: Optional[bool] = None
                       ) -> Tuple[Dict, Dict, Dict]:
    """Returns (params, disc_params, spectral) numpy trees.

    sd: the torch `model_state_dict` (tensors or numpy arrays).
    """
    # np.array(..) COPIES: torch's .numpy() shares memory with live module
    # buffers, and e.g. spectral_norm updates weight_u IN PLACE on forward —
    # a converted view would silently change under us.
    sd = {k: np.array(v.numpy() if hasattr(v, "numpy") else v)
          for k, v in sd.items()}
    p: Dict = {}

    # ----- Encoder (reference encoder.py:56-101) -----
    _conv_block(p, sd, "Encoder.conv_block1", "encoder/conv_stem")
    # _conv_block derived name fix: stem norm is norm_stem
    for i in range(4):
        _conv_block(p, sd, f"Encoder.conv_block{i + 2}",
                    f"encoder/conv_down{i}")
    _set(p, "encoder/conv_out/Conv_0/kernel",
         _conv(sd["Encoder.conv_block_out.1.weight"]))
    _set(p, "encoder/conv_out/Conv_0/bias", sd["Encoder.conv_block_out.1.bias"])

    # ----- Generator (reference generator.py:98-142) -----
    _set(p, "generator/norm_in/gamma",
         _norm(sd["Generator.conv_block_init.0.gamma"]))
    _set(p, "generator/norm_in/beta",
         _norm(sd["Generator.conv_block_init.0.beta"]))
    _set(p, "generator/conv_head/Conv_0/kernel",
         _conv(sd["Generator.conv_block_init.2.weight"]))
    _set(p, "generator/conv_head/Conv_0/bias",
         sd["Generator.conv_block_init.2.bias"])
    _set(p, "generator/norm_head/gamma",
         _norm(sd["Generator.conv_block_init.3.gamma"]))
    _set(p, "generator/norm_head/beta",
         _norm(sd["Generator.conv_block_init.3.beta"]))
    for m in range(n_residual_blocks):
        tp, jp = f"Generator.resblock_{m}", f"generator/resblock_{m}"
        for conv, norm in (("conv1", "norm1"), ("conv2", "norm2")):
            _set(p, f"{jp}/{conv}/Conv_0/kernel", _conv(sd[f"{tp}.{conv}.weight"]))
            _set(p, f"{jp}/{conv}/Conv_0/bias", sd[f"{tp}.{conv}.bias"])
            _set(p, f"{jp}/{norm}/gamma", _norm(sd[f"{tp}.{norm}.gamma"]))
            _set(p, f"{jp}/{norm}/beta", _norm(sd[f"{tp}.{norm}.beta"]))
    for i in range(4):
        tp = f"Generator.upconv_block{i + 1}"
        _set(p, f"generator/upconv{i}/kernel", _convT(sd[f"{tp}.0.weight"]))
        _set(p, f"generator/upconv{i}/bias", sd[f"{tp}.0.bias"])
        _set(p, f"generator/norm_up{i}/gamma", _norm(sd[f"{tp}.1.gamma"]))
        _set(p, f"generator/norm_up{i}/beta", _norm(sd[f"{tp}.1.beta"]))
    _set(p, "generator/conv_out/Conv_0/kernel",
         _conv(sd["Generator.conv_block_out.1.weight"]))
    _set(p, "generator/conv_out/Conv_0/bias",
         sd["Generator.conv_block_out.1.bias"])

    # ----- Hyperprior transforms (reference hyper.py:45-97) -----
    for i in (1, 2, 3):
        tp = f"Hyperprior.analysis_net.conv{i}"
        _set(p, f"hyperprior/analysis_net/conv{i}/Conv_0/kernel",
             _conv(sd[f"{tp}.weight"]))
        _set(p, f"hyperprior/analysis_net/conv{i}/Conv_0/bias",
             sd[f"{tp}.bias"])
    if "Hyperprior.synthesis_DLMM_params.conv1.weight" in sd:
        # DLMM variant (reference hyperprior.py:340-370, hyper.py:100-130):
        # one synthesis head emitting C*K*3 mixture parameters.
        tpfx = "Hyperprior.synthesis_DLMM_params"
        jp = "hyperprior/synthesis_dlmm"
        for i in (1, 2):
            _set(p, f"{jp}/conv{i}/kernel", _convT(sd[f"{tpfx}.conv{i}.weight"]))
            _set(p, f"{jp}/conv{i}/bias", sd[f"{tpfx}.conv{i}.bias"])
        # conv3 is a STRIDE-1 ConvTranspose2d (flip + IO swap, like below)
        _set(p, f"{jp}/conv3/Conv_0/kernel", _convT(sd[f"{tpfx}.conv3.weight"]))
        _set(p, f"{jp}/conv3/Conv_0/bias", sd[f"{tpfx}.conv3.bias"])
        _set(p, f"{jp}/conv_out/Conv_0/kernel",
             _conv(sd[f"{tpfx}.conv_out.weight"]))
        _set(p, f"{jp}/conv_out/Conv_0/bias", sd[f"{tpfx}.conv_out.bias"])
        synthesis_nets = ()
    else:
        synthesis_nets = ("synthesis_mu", "synthesis_std")
    for net in synthesis_nets:
        for i in (1, 2):  # ConvTranspose s2 layers
            tp = f"Hyperprior.{net}.conv{i}"
            _set(p, f"hyperprior/{net}/conv{i}/kernel", _convT(sd[f"{tp}.weight"]))
            _set(p, f"hyperprior/{net}/conv{i}/bias", sd[f"{tp}.bias"])
        # conv3 is a STRIDE-1 ConvTranspose2d in the reference (hyper.py:85)
        # == a plain conv with spatially flipped kernel and I/O swapped.
        tp = f"Hyperprior.{net}.conv3"
        _set(p, f"hyperprior/{net}/conv3/Conv_0/kernel", _convT(sd[f"{tp}.weight"]))
        _set(p, f"hyperprior/{net}/conv3/Conv_0/bias", sd[f"{tp}.bias"])

    # ----- Hyperlatent density (reference hyperprior_model.py:286-303) -----
    for k in range(density_filters):
        tp = f"Hyperprior.hyperlatent_likelihood"
        _set(p, f"hyperprior/hyperlatent_density/H_{k}", sd[f"{tp}.H_{k}"])
        _set(p, f"hyperprior/hyperlatent_density/a_{k}", sd[f"{tp}.a_{k}"])
        _set(p, f"hyperprior/hyperlatent_density/b_{k}", sd[f"{tp}.b_{k}"])

    # ----- Discriminator (reference discriminator.py:35-64) -----
    disc: Dict = {}
    spectral: Dict = {}
    if has_discriminator is None:
        has_discriminator = "Discriminator.context_conv.weight" in sd
    if has_discriminator:
        _set(disc, "context_conv/Conv_0/kernel",
             _conv(sd["Discriminator.context_conv.weight"]))
        _set(disc, "context_conv/Conv_0/bias",
             sd["Discriminator.context_conv.bias"])
        for i in (1, 2, 3, 4):
            tp = f"Discriminator.conv{i}"
            _set(disc, f"conv{i}/kernel", _conv(sd[f"{tp}.weight_orig"]))
            _set(disc, f"conv{i}/bias", sd[f"{tp}.bias"])
            _set(spectral, f"conv{i}/u", sd[f"{tp}.weight_u"])
        _set(disc, "conv_out/Conv_0/kernel",
             _conv(sd["Discriminator.conv_out.weight"]))
        _set(disc, "conv_out/Conv_0/bias", sd["Discriminator.conv_out.bias"])

    return p, disc, spectral


def load_reference_checkpoint(path: str, **kw):
    """Load a reference .pt checkpoint file and convert.

    Returns (params, disc_params, spectral, lpips_params). The reference
    Model registers PerceptualLoss as a submodule (src/model.py), so full
    checkpoints embed the calibrated AlexNet backbone + lin heads;
    lpips_params carries them (None when the keys are absent).
    """
    import torch

    from hific_tpu.models.lpips import lpips_params_from_reference_state

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state_dict", ckpt)
    lpips_params = lpips_params_from_reference_state(sd)
    sd = {k: v for k, v in sd.items() if not k.startswith("perceptual_loss")}
    return convert_state_dict(sd, **kw) + (lpips_params,)
