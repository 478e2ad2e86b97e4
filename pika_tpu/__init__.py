"""pika_tpu — a TPU-native (JAX/XLA/Pallas) end-to-end speech recognition
framework with the capabilities of tencent-ailab/pika:

  * on-the-fly data augmentation + feature extraction (fused on-device)
  * TDNN-Transformer encoder, convolution+transformer prediction network
  * RNN-T training (Pallas fused-joint loss) and batched beam decoding
  * RNN-T decoding with external n-gram FST shallow fusion
  * RNN-T minimum Bayes risk (MBR) training
  * LAS forward/backward rescoring of RNN-T N-best
  * data-parallel training over a jax.sharding.Mesh (per-step all-reduce
    or BMUF block-momentum semantics)

Unlike the reference (PyTorch + Kaldi/PyKaldi + warp-rnnt CUDA), everything
here is built TPU-first: static shapes, lax.scan control flow, Pallas kernels
for the transducer-loss hot path, and SPMD collectives over ICI instead of
NCCL master/worker reduce+broadcast.
"""

__version__ = "0.1.0"
