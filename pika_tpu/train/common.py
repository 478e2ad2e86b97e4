"""Shared CLI plumbing: argparse registration mirroring the reference's
flag surface (trainer/train_transducer_bmuf_otfaug.py:150-255 and
loader/otf_utt_loader.py:68-114), plus builders that turn parsed flags
into featurizers, loader configs, and optimizers."""

from __future__ import annotations

import argparse
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from pika_tpu.data.cmvn import CmvnStats, offset_scale
from pika_tpu.data.loader import OtfLoaderConfig
from pika_tpu.features.fbank import FbankConfig
from pika_tpu.train.lr import make_optimizer
from pika_tpu.train.step import (
    FeaturizerConfig, make_featurizer, make_feats_featurizer,
)


def maybe_distributed_init(args):
    """Multi-host SPMD init (replaces ``torch.distributed.launch
    --nnodes/--node_rank/--master_addr``, the reference's multi-node
    template at egs/train_transducer_mbr_bmuf_otfaug.sh:37).

    Every host runs the SAME training command with its own
    ``--process_id``; ``jax.distributed`` wires the pod/DCN topology and
    the device mesh then spans all hosts.  Returns
    ``(process_index, process_count)`` — callers use process 0 for
    checkpoint/bundle writes and substitute the index into WORKER-ID
    log paths.
    """
    import jax

    if getattr(args, "coordinator_address", None):
        if os.environ.get("JAX_PLATFORMS", "").split(",")[0].strip() == "cpu":
            # Multi-process CPU collectives need an explicit cross-host
            # implementation (the 2-process test topology,
            # tests/test_multihost.py); TPU meshes ride ICI/DCN natively.
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            coordinator_address=args.coordinator_address,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    return jax.process_index(), jax.process_count()


def configure_rng(args) -> None:
    """Select the PRNG implementation behind ``jax.random.PRNGKey``.

    ``--rng_impl rbg`` routes random-bit generation (dropout masks,
    dither, SpecAugment spans) through XLA's RngBitGenerator — the TPU
    hardware RNG — instead of threefry2x32's ALU lattice.  At flagship
    batch 32 the threefry dropout masks cost ~67 ms of the 372 ms train
    step (BASELINE.md round-4 profile); rbg generates the same-shaped
    unbiased masks at near-zero cost.  rbg keys still split/fold_in via
    threefry (so per-step key derivation stays well-mixed); only the
    bits draw changes.  The default is ``auto``: rbg on accelerator
    backends (the reference trains with cuRAND device-RNG dropout —
    hardware RNG on the device is its semantics), threefry on CPU so
    the test suite and CPU reruns stay bit-exact across hosts.  rbg
    runs are deterministic per backend+compiler version but not across
    them; the deterministic recipes (egs/mini_*.sh) pin
    ``--rng_impl threefry2x32`` because their committed-verbatim WERs
    were measured under threefry bits.

    Must be called before any jit tracing; the impl is baked into
    traced programs at trace time.
    """
    import jax

    impl = getattr(args, "rng_impl", "auto")
    if impl == "auto":
        impl = "threefry2x32" if jax.default_backend() == "cpu" else "rbg"
    # Always set the resolved impl — an explicit threefry pin must win
    # even when the ambient default was changed (JAX_DEFAULT_PRNG_IMPL).
    jax.config.update("jax_default_prng_impl", impl)
    # stash the resolution for downstream auto policies (attn_cheap_dropout)
    args.rng_impl_resolved = impl
    return impl


def host_key(key):
    """A PRNG key as host numpy, safe to feed a multi-host jit.

    ``jax.random.split`` commits its output to the process-local default
    device; feeding that committed single-device array into a computation
    over a multi-host mesh is a device-assignment error.  A numpy array is
    uncommitted — jit replicates it onto the mesh (every process computes
    the same value, so the replication is consistent)."""
    return np.asarray(key)


def add_loader_args(parser: argparse.ArgumentParser) -> None:
    """Loader flags (loader/otf_utt_loader.py:68-114)."""
    parser.add_argument("--lctx", type=int, default=1)
    parser.add_argument("--rctx", type=int, default=1)
    parser.add_argument("--max_len", type=int, default=6000)
    parser.add_argument("--num_workers", type=int, default=2)
    parser.add_argument("--sample_rate", type=int, default=16000)
    parser.add_argument("--batch_first", action="store_true")
    parser.add_argument("--reverse_labels", action="store_true")
    parser.add_argument("--feat_config", type=str, default=None)
    parser.add_argument("--stride", type=int, default=1)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--SOS", type=int, default=-1)
    parser.add_argument("--EOS", type=int, default=-1)
    parser.add_argument("--queue_size", type=int, default=8)
    parser.add_argument("--TU_limit", type=int, default=15000)
    parser.add_argument("--padding_tgt", type=int, default=0)
    parser.add_argument("--feats_dim", type=int, default=80)
    parser.add_argument("--gain_range", type=str, default="55,10")
    parser.add_argument("--speed_rate", type=str, default="0.9,1.0,1.1")
    parser.add_argument("--no_augment", action="store_true",
                        help="disable speed/gain perturbation")
    parser.add_argument("--noise_lst", type=str, default=None,
                        help="mrk/seq list of noise segments for on-the-fly mixing")
    parser.add_argument("--rir_lst", type=str, default=None,
                        help="mrk/seq list of room impulse responses (hook)")
    parser.add_argument("--snr_range", type=str, default="",
                        help="comma separated SNR range in dB, e.g. 0,20")
    parser.add_argument("--noise_prob", type=float, default=1.0,
                        help="fraction of utterances that get noise mixed in "
                             "(multi-condition training: the rest stay clean)")
    parser.add_argument("--max_wav_seconds", type=float, default=20.0,
                        help="largest waveform bucket in seconds")


def add_model_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--encoder_type", type=str, default="rnn",
                        choices=["rnn", "transformer"])
    parser.add_argument("--decoder_type", type=str, default="rnn",
                        choices=["rnn", "transformer"])
    parser.add_argument("--enc_layers", type=int, default=2)
    parser.add_argument("--dec_layers", type=int, default=2)
    parser.add_argument("--rnn_size", type=int, default=512)
    parser.add_argument("--embd_dim", type=int, default=300)
    parser.add_argument("--output_dim", type=int, default=8000)
    parser.add_argument("--model_lctx", type=int, default=0)
    parser.add_argument("--model_rctx", type=int, default=0)
    parser.add_argument("--model_stride", type=int, default=1)
    parser.add_argument("--brnn", action="store_true")
    parser.add_argument("--dropout", type=float, default=0.3)
    parser.add_argument("--tdnn_nhid", type=int, default=1024)
    parser.add_argument("--tdnn_layers", type=int, default=9)
    parser.add_argument("--tdnn_transformer_dropout", type=float, default=0.2,
                        help="attention/FFN dropout inside the TDNN-"
                             "Transformer encoder's transformer layers "
                             "(reference hardcodes 0.2, "
                             "rnnt_tdnn_transformer.py:64)")
    parser.add_argument("--attn_chunk", type=int, default=0,
                        help="chunked encoder self-attention: scan over "
                             "query blocks of this size (O(T*chunk) memory "
                             "instead of O(T^2)); 0 = full attention. "
                             "Combine with --remat for the longest inputs. "
                             "Note: train-time attention-dropout noise "
                             "differs from the full path (one mask shared "
                             "across heads, memory-proportional to a block)")
    parser.add_argument("--remat", action="store_true",
                        help="rematerialize encoder transformer layers in "
                             "the backward pass (jax.checkpoint): trades "
                             "~1/3 extra encoder FLOPs for not holding the "
                             "attention tensors in HBM — enables longer "
                             "utterances / larger batches per chip")
    parser.add_argument("--attn_cheap_dropout", type=str, default="auto",
                        choices=["auto", "on", "off"],
                        help="attention-probability dropout via a single "
                             "bits-threshold mask shared across heads "
                             "(unbiased, head-correlated noise, 16x fewer "
                             "random bits than per-head bernoulli; "
                             "tests/test_attn_options.py pins the "
                             "expectation).  auto (default) = on when the "
                             "resolved --rng_impl is rbg (accelerators), "
                             "off under threefry so the deterministic "
                             "recipes' committed-verbatim WERs reproduce.  "
                             "Measured at flagship batch 32 under rbg: "
                             "334.5 -> 312.5 ms/step (+7%%, BASELINE.md "
                             "round-5 profile)")


def resolve_cheap_dropout(args) -> bool:
    """``--attn_cheap_dropout`` policy: explicit on/off wins; auto pairs
    the cheap mask with the hardware RNG (rbg) the same way --rng_impl
    auto pairs rbg with accelerators.  Requires configure_rng(args) to
    have run (it stashes ``rng_impl_resolved``)."""
    flag = getattr(args, "attn_cheap_dropout", "auto")
    if flag == "on":
        return True
    if flag == "off":
        return False
    return getattr(args, "rng_impl_resolved", "threefry2x32") == "rbg"


def add_train_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--init_model", type=str, default=None)
    parser.add_argument("--cmn", action="store_true")
    parser.add_argument("--cmvn_stats", type=str, default=None)
    parser.add_argument("--optim", type=str, default="sgd",
                        choices=["sgd", "adam", "adadelta"])
    parser.add_argument("--grad_clip", type=float, default=-1.0)
    parser.add_argument("--initial_lr", type=float, default=1.0)
    parser.add_argument("--final_lr", type=float, default=1.0)
    parser.add_argument("--momentum", type=float, default=0.9)
    parser.add_argument("--num_epochs", type=int, default=15)
    parser.add_argument("--num_batches_per_epoch", type=int, default=1000)
    parser.add_argument("--log_per_n_frames", type=int, default=1024 * 1024)
    parser.add_argument("--seed", type=int, default=777)
    parser.add_argument("--rng_impl", type=str, default="auto",
                        choices=["auto", "threefry2x32", "rbg"],
                        help="PRNG behind dropout/dither/SpecAugment "
                             "masks.  rbg = TPU hardware RngBitGenerator "
                             "(recovers ~18%% of the flagship train step "
                             "vs threefry's ALU-heavy bits; measured "
                             "95.4 vs 85.4 utt/s, BASELINE.md round 4); "
                             "threefry = bit-exact reproducibility "
                             "across backends (the deterministic recipes "
                             "pin it); auto (default) = rbg on "
                             "accelerators, threefry on CPU")
    # distributed strategy (replaces torch.distributed.launch + BMUF flags)
    parser.add_argument("--dp_mode", type=str, default="sync",
                        choices=["sync", "bmuf", "blockadam", "bmufadam"])
    parser.add_argument("--num_devices", type=int, default=None,
                        help="mesh size (default: all visible devices)")
    parser.add_argument("--block_momentum", type=float, default=0.9)
    parser.add_argument("--block_lr", type=float, default=1.0)
    parser.add_argument("--sync_period", type=int, default=5)
    # SpecAugment
    parser.add_argument("--spec_augment", action="store_true")
    parser.add_argument("--max_freq_span", type=int, default=15)
    parser.add_argument("--max_time_span", type=int, default=35)
    parser.add_argument("--async_save", action="store_true",
                        help="fetch + write per-epoch checkpoints in a "
                             "background thread (keep off when D2H contends "
                             "with compute, e.g. tunneled transports)")
    parser.add_argument("--save_interval", type=int, default=1,
                        help="save checkpoints every N epochs (the final "
                             "epoch always saves).  Parameters only leave "
                             "the device on saving epochs, so >1 amortizes "
                             "the full-state D2H fetch on slow transports; "
                             "1 matches the reference's per-epoch "
                             "torch.save (train_transducer_bmuf_otfaug."
                             "py:363-366)")
    parser.add_argument("--steps_per_dispatch", type=int, default=4,
                        help="sync mode: train steps fused into one XLA "
                             "dispatch + one H2D transfer (amortizes "
                             "per-transfer transport latency)")
    parser.add_argument("--loss_chunk", type=int, default=16)
    parser.add_argument("--loss_backend", type=str, default="auto",
                        choices=["auto", "xla", "pallas"])
    parser.add_argument("--pruned_loss_range", type=int, default=0,
                        help="train with the pruned RNN-T objective "
                             "(ops/rnnt_pruned.py): the full gated joint "
                             "is evaluated only on a per-frame band of N "
                             "label positions picked by a cheap additive "
                             "'simple' joint (k2-style), cutting the loss "
                             "slice's B*T*U*H*V matmul by ~U/N.  0 "
                             "(default) = the exact full-lattice fused "
                             "loss.  Adds two linear heads to the model "
                             "(config.simple_joint)")
    parser.add_argument("--simple_loss_scale", type=float, default=0.5,
                        help="auxiliary simple-joint loss weight under "
                             "--pruned_loss_range")
    parser.add_argument("--pruned_warmup_epochs", type=int, default=2,
                        help="epochs that down-weight the banded term to "
                             "0.1 while the simple joint's alignment "
                             "stabilizes (k2-style warmup; a cold-start "
                             "simple joint yields degenerate bands that "
                             "the pruned objective would lock in)")
    parser.add_argument("--compute_dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"],
                        help="model compute precision (master params stay f32)")
    # multi-host SPMD (one process per host; all hosts run the same command)
    parser.add_argument("--coordinator_address", type=str, default=None)
    parser.add_argument("--num_processes", type=int, default=1)
    parser.add_argument("--process_id", type=int, default=0)


def fbank_from_args(args) -> FbankConfig:
    if args.feat_config:
        return FbankConfig.from_conf(args.feat_config)
    return FbankConfig(
        sample_frequency=args.sample_rate, window_type="hamming",
        dither=1.0, low_freq=40.0, high_freq=-200.0,
        num_mel_bins=args.feats_dim,
    )


def loader_cfg_from_args(args, batch_size: Optional[int] = None) -> OtfLoaderConfig:
    fb = fbank_from_args(args)
    gains = tuple(float(g) for g in args.gain_range.split(","))
    speeds = tuple(float(s) for s in args.speed_rate.split(","))
    max_samples = int(args.max_wav_seconds * args.sample_rate)
    buckets = tuple(int(max_samples * f) for f in (0.25, 0.5, 0.75, 1.0))
    snr = None
    if getattr(args, "snr_range", ""):
        lo, hi = (float(x) for x in args.snr_range.split(","))
        snr = (lo, hi)
    return OtfLoaderConfig(
        batch_size=batch_size or args.batch_size,
        snr_range=snr,
        noise_prob=getattr(args, "noise_prob", 1.0),
        sample_rate=args.sample_rate,
        frame_length=fb.frame_length,
        frame_shift=fb.frame_shift,
        stride=args.stride,
        max_len=args.max_len,
        tu_limit=args.TU_limit,
        speed_rates=speeds,
        gain_range=gains,
        num_workers=args.num_workers,
        queue_size=args.queue_size,
        reverse_labels=args.reverse_labels,
        sos=args.SOS,
        eos=args.EOS,
        pad_label=args.padding_tgt,
        seed=args.seed,
        wav_buckets=buckets,
        label_buckets=(16, 32, 64, 128),
        augment=not args.no_augment,
    )


def featurizer_from_args(args, spec_augment: Optional[bool] = None):
    """Returns (featurizer, input_dim, max_samples)."""
    fb = fbank_from_args(args)
    max_samples = int(args.max_wav_seconds * args.sample_rate)
    offset = scale = None
    if args.cmvn_stats:
        stats = CmvnStats.read(args.cmvn_stats)
        off, sc = offset_scale(stats.stats, splice_copies=args.lctx + 1 + args.rctx)
        offset, scale = jnp.asarray(off), jnp.asarray(sc)
    cfg = FeaturizerConfig(
        fbank=fb, max_samples=max_samples,
        lctx=args.lctx, rctx=args.rctx, stride=args.stride,
        cmn=args.cmn,
        spec_augment=args.spec_augment if spec_augment is None else spec_augment,
        max_freq_span=args.max_freq_span, max_time_span=args.max_time_span,
    )
    input_dim = fb.num_mel_bins * (args.lctx + 1 + args.rctx)
    return make_featurizer(cfg, offset, scale), input_dim, max_samples


def add_utt_loader_args(parser: argparse.ArgumentParser) -> None:
    """Loader selection — the reference's dynamic loader import
    (trainer/train_transducer_bmuf_otfaug.py:258-263): ``otf`` reads raw
    waveforms, ``utt`` reads precomputed feature archives
    (loader/utt_loader.py)."""
    parser.add_argument("--loader", type=str, default="otf",
                        choices=["otf", "utt"],
                        help="otf: raw-waveform archives with on-the-fly "
                             "augmentation + fused device fbank; utt: "
                             "precomputed features (data_lst is a "
                             "feats.scp/.ark, labels via --ali_rspec)")
    parser.add_argument("--ali_rspec", type=str, default=None,
                        help="label rspec (ark:label.txt) for --loader utt")
    parser.add_argument("--buffer_size", type=int, default=1024,
                        help="shuffle buffer (utterances) for --loader utt "
                             "(reference utt_loader --buffer_size)")


def feats_featurizer_from_args(args, spec_augment: Optional[bool] = None):
    """Featurizer + input_dim for the --loader utt (precomputed-feature)
    training path.  The host loader splices/strides in the feature domain
    (reference loader/utt_loader.py); CMVN + SpecAugment stay on device."""
    offset = scale = None
    if args.cmvn_stats:
        stats = CmvnStats.read(args.cmvn_stats)
        off, sc = offset_scale(stats.stats, splice_copies=args.lctx + 1 + args.rctx)
        offset, scale = jnp.asarray(off), jnp.asarray(sc)
    featurize = make_feats_featurizer(
        cmvn_offset=offset, cmvn_scale=scale, cmn=args.cmn,
        use_spec_augment=(args.spec_augment if spec_augment is None
                          else spec_augment),
        max_freq_span=args.max_freq_span, max_time_span=args.max_time_span,
    )
    input_dim = args.feats_dim * (args.lctx + 1 + args.rctx)
    return featurize, input_dim


def optimizer_from_args(args):
    return make_optimizer(
        args.optim, args.initial_lr, args.final_lr,
        args.num_epochs * args.num_batches_per_epoch,
        args.momentum, args.grad_clip,
    )


def expand_worker_lists(data_lst: str, n: int):
    """WORKER-ID substitution (train_transducer:285): one SPMD process owns
    all devices, so per-worker lists are merged into one stream."""
    if "WORKER-ID" not in data_lst:
        return [data_lst]
    return [data_lst.replace("WORKER-ID", str(i)) for i in range(n)]


def load_noise_segments(noise_lst: Optional[str]):
    """Load noise (or RIR) waveforms from an mrk/seq list file — the
    reference's rir/noise hook (train_transducer:276-288)."""
    if not noise_lst:
        return None
    from pika_tpu.data import segment as seg
    from pika_tpu.data.archive import MrkSeqReader
    from pika_tpu.data.scp import read_data_lst

    out = []
    for entry in read_data_lst(noise_lst) or [
        tuple(line.split()[:2]) + ("",) for line in open(noise_lst)
    ]:
        with MrkSeqReader(entry[0], entry[1]) as reader:
            for _, pcm in reader:
                out.append(seg.to_float32(pcm))
    return out
