"""Shared glue for tests that use the reference tree as an oracle."""

import numpy as np


def convert_ref_hyperprior_state(sd, set_fn=None):
    """Map a reference Hyperprior state_dict (src/hyperprior.py:142-174) to
    our flax Hyperprior param tree (hific_tpu/models/hyperprior.py)."""
    from hific_tpu.utils.convert_torch import _conv, _convT, _set

    p = {}
    for i in (1, 2, 3):
        _set(p, f"analysis_net/conv{i}/Conv_0/kernel",
             _conv(sd[f"analysis_net.conv{i}.weight"]))
        _set(p, f"analysis_net/conv{i}/Conv_0/bias",
             sd[f"analysis_net.conv{i}.bias"])
    for net in ("synthesis_mu", "synthesis_std"):
        for i in (1, 2):
            _set(p, f"{net}/conv{i}/kernel", _convT(sd[f"{net}.conv{i}.weight"]))
            _set(p, f"{net}/conv{i}/bias", sd[f"{net}.conv{i}.bias"])
        # stride-1 ConvTranspose2d == conv with flipped kernel (hyper.py:85)
        _set(p, f"{net}/conv3/Conv_0/kernel", _convT(sd[f"{net}.conv3.weight"]))
        _set(p, f"{net}/conv3/Conv_0/bias", sd[f"{net}.conv3.bias"])
    for k in range(4):
        _set(p, f"hyperlatent_density/H_{k}",
             sd[f"hyperlatent_likelihood.H_{k}"])
        _set(p, f"hyperlatent_density/a_{k}",
             sd[f"hyperlatent_likelihood.a_{k}"])
        _set(p, f"hyperlatent_density/b_{k}",
             sd[f"hyperlatent_likelihood.b_{k}"])
    return p


def to_numpy_tree(tree):
    import jax

    return jax.tree_util.tree_map(np.asarray, tree)
