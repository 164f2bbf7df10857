"""hific_tpu — a TPU-native (JAX/XLA/Pallas/pjit) high-fidelity generative
image compression framework.

Re-implements the full capability surface of the reference HiFiC codebase
(Justin-Tan/high-fidelity-generative-compression — see SURVEY.md) as an
idiomatic JAX framework: NHWC convolutional transforms, a hyperprior entropy
model evaluated with fused TPU kernels, data-parallel training over a device
mesh, and a host-side vectorized rANS entropy-coding backend producing a
binary `.hfc` container.
"""

__version__ = "0.1.0"
