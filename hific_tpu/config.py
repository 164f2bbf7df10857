"""Configuration system.

Layered like the reference (default_config.py:32-112): shared defaults →
model-type specialization → CLI overrides, with regime → (target_rate,
lambda_A) resolution. Expressed as frozen dataclasses so configs are
hashable and can be closed over by jitted functions; runs are
self-describing because the full config is serialized into checkpoints.
"""

import dataclasses
import json
from typing import Optional, Tuple


class ModelTypes:
    COMPRESSION = "compression"
    COMPRESSION_GAN = "compression_gan"


class ModelModes:
    TRAINING = "training"
    VALIDATION = "validation"
    EVALUATION = "evaluation"  # actual entropy coding


# Paper Table 3a regimes (reference default_config.py:82-86).
TARGET_RATE_MAP = {"low": 0.14, "med": 0.3, "high": 0.45}
LAMBDA_A_MAP = {"low": 2.0 ** 1, "med": 2.0 ** 0, "high": 2.0 ** (-1)}


@dataclasses.dataclass(frozen=True)
class Schedule:
    """Piecewise-constant multiplier schedule (reference
    default_config.py:76-78, utils.py:64-72): value = base * vals[i] where i
    is the number of boundaries in `steps` passed by step_counter."""

    vals: Tuple[float, ...] = (1.0,)
    steps: Tuple[int, ...] = ()


@dataclasses.dataclass(frozen=True)
class Config:
    # Experiment
    name: str = "hific_v0.1"
    model_type: str = ModelTypes.COMPRESSION
    regime: str = "low"

    # Training
    n_steps: int = 1_000_000
    batch_size: int = 8
    crop_size: int = 256
    learning_rate: float = 1e-4
    weight_decay: float = 1e-6
    log_interval: int = 1000
    save_interval: int = 50_000
    discriminator_steps: int = 0

    # Architecture (defaults = paper Table 3a)
    latent_channels: int = 220
    n_residual_blocks: int = 9
    hyperlatent_filters: int = 320
    use_channel_norm: bool = True
    likelihood_type: str = "gaussian"
    normalize_input_image: bool = False
    sample_noise: bool = False
    noise_dim: int = 32

    # DLMM variant
    use_latent_mixture_model: bool = False
    mixture_components: int = 4
    latent_channels_dlmm: int = 64

    # Loss weights (reference default_config.py:58-61)
    lambda_B: float = 2.0 ** (-4)
    k_M: float = 0.075 * 2.0 ** (-5)
    k_P: float = 1.0
    beta: float = 0.15
    gan_loss_type: str = "non_saturating"

    # Schedules (reference default_config.py:76-79)
    lambda_schedule: Schedule = Schedule(vals=(2.0, 1.0), steps=(50_000,))
    lr_schedule: Schedule = Schedule(vals=(1.0, 0.1), steps=(500_000,))
    target_schedule: Schedule = Schedule(vals=(0.20 / 0.14, 1.0), steps=(50_000,))
    ignore_schedule: bool = False

    # Compute
    dtype: str = "float32"  # compute dtype for conv stacks ('bfloat16' on TPU)
    use_pallas_norm: bool = False  # fused ChannelNorm+act Pallas kernel
    # Space-to-depth reparametrization of the encoder stem + first
    # downsample (ops/s2d.py): exact same math/params on a half-res packed
    # grid with ~4x the lane occupancy of the layout-bound full-res stages.
    s2d_encoder_front: bool = False
    # Depth-to-space reparametrization of the generator's final upsample +
    # RGB projection (ops/d2s.py): exact same math/params on the half-res
    # packed grid. ON by default: measured -23% on the whole flagship
    # generator forward (32.3 -> 24.9 ms/img at 1 MP bf16) and neutral on
    # the training step (PERF.md round 3). Falls back to the standard tail
    # automatically for non-channel norms.
    d2s_generator_tail: bool = True
    use_remat: bool = False  # rematerialize resblocks (memory for FLOPs)

    # Rate target resolved from regime unless explicitly set
    target_rate: Optional[float] = None
    lambda_A: Optional[float] = None

    def __post_init__(self):
        if self.target_rate is None:
            object.__setattr__(self, "target_rate", TARGET_RATE_MAP[self.regime])
        if self.lambda_A is None:
            object.__setattr__(self, "lambda_A", LAMBDA_A_MAP[self.regime])

    @property
    def norm_type(self):
        return "channel" if self.use_channel_norm else "instance"

    @property
    def effective_latent_channels(self):
        return (self.latent_channels_dlmm if self.use_latent_mixture_model
                else self.latent_channels)

    @property
    def use_discriminator(self):
        return self.model_type == ModelTypes.COMPRESSION_GAN

    def to_json(self):
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, s):
        d = json.loads(s)
        for key in ("lambda_schedule", "lr_schedule", "target_schedule"):
            if key in d and isinstance(d[key], dict):
                d[key] = Schedule(vals=tuple(d[key]["vals"]),
                                  steps=tuple(d[key]["steps"]))
        return cls(**d)

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


def mse_lpips_config(**kw) -> Config:
    """R-D + perceptual loss only (reference default_config.py:97-102)."""
    kw.setdefault("model_type", ModelTypes.COMPRESSION)
    return Config(**kw)


def hific_config(**kw) -> Config:
    """Full generative-loss config (reference default_config.py:104-112)."""
    kw.setdefault("model_type", ModelTypes.COMPRESSION_GAN)
    kw.setdefault("discriminator_steps", 1)
    kw.setdefault("gan_loss_type", "non_saturating")
    return Config(**kw)
