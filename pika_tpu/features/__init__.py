"""On-device feature extraction: Kaldi-semantics fbank, splice/stride,
CMVN application, and SpecAugment — all jittable."""

from pika_tpu.features.fbank import (
    FbankConfig,
    fbank_numpy,
    make_fbank_fn,
    mel_banks_matrix,
    feature_window,
    num_frames,
)
from pika_tpu.features.pipeline import (
    splice,
    stride_subsample,
    strided_len,
    model_output_len,
    apply_cmvn,
    spec_augment,
    pad_to_bucket,
)
