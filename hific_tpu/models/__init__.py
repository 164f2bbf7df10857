from hific_tpu.models.encoder import Encoder
from hific_tpu.models.generator import Generator
from hific_tpu.models.discriminator import Discriminator
from hific_tpu.models.hyper import (
    HyperpriorAnalysis,
    HyperpriorSynthesis,
    HyperpriorSynthesisDLMM,
)
