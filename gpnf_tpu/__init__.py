"""gpnf_tpu — TPU-native normalizing-flow + Gaussian-process framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
`Jim-Maar/Gaussian-Processes-after-pre-processing-with-Normalising-Flows-2`
(mAR-SCF multi-scale flows with ConvLSTM autoregressive priors, invertible
attention, SRFlow conditional super-resolution flows) plus an exact GP
regression head on flow-warped features.

Array convention: images are NCHW float32 (or bf16 compute), log-determinants
are per-sample vectors of shape (B,). Every bijector is a pure-function pair
    forward(params, x, logdet, ...) -> (y, logdet + ldj)
    inverse(params, y, logdet, ...) -> (x, logdet - ldj)
Parameters are plain pytrees (nested dicts of jnp arrays); modules hold only
static configuration, so they can be closed over inside `jax.jit`.
"""

__version__ = "0.1.0"
