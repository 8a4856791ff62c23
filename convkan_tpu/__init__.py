"""convkan_tpu — a TPU-native JAX/Pallas framework for Convolutional
Kolmogorov-Arnold Networks (KANs).

Re-designed from scratch for TPU (JAX / XLA / Pallas / pjit) with the same
capabilities as the PyTorch reference GadGadGad/Convolutional-KAN-for-Image-
Classification: 17 KAN basis families with MLP and 1D/2D/3D convolutional
variants, conv/MLP factories, seven classic CNN architectures assembled from
any KAN conv type, and a training/eval harness over MNIST/SVHN/CIFAR-10/100.

Layout conventions (TPU-first, deliberately different from the reference):
  * activations are NHWC / NDHWC (channel-last; lane dim = C on TPU),
  * conv weights are HWIO with the group axis folded into O,
  * grouped execution is a single XLA conv with feature_group_count
    instead of a python loop over per-group modules,
  * all basis recurrences are unrolled pure functions fused by XLA (or
    hand-fused Pallas kernels on the hot path).
"""

__version__ = "0.1.0"

from . import basis, config, factory, nn, ops, parallel, train, utils  # noqa: F401

from .factory import CONV_KAN_FACTORY, MLP_KAN_FACTORY  # noqa: F401
