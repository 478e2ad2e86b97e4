"""Data preparation CLI — replaces utils/{wav_to_seq, wav_to_bytes,
split_by_length, shuffle_by_length, compute_global_cmvn}.py and the Kaldi
perl tools with one subcommand tool:

    python -m pika_tpu.data.prep wav_to_seq WAV_SCP OUT_MRK OUT_SEQ
    python -m pika_tpu.data.prep wav_to_bytes WAV_SCP OUT
    python -m pika_tpu.data.prep split_by_length LENS --batch_size N --world_size W
    python -m pika_tpu.data.prep shuffle_by_length LENS OUT --batch_size N
    python -m pika_tpu.data.prep compute_global_cmvn DATA_LST OUT_STATS [--feat_config F]
"""

from __future__ import annotations

import argparse

import numpy as np


def _cmd_wav_to_seq(args):
    from pika_tpu.data.archive import wav_scp_to_mrk_seq

    shards = wav_scp_to_mrk_seq(args.wav_scp, args.out_mrk, args.out_seq, args.num_wav_per_seq)
    for mrk, seq in shards:
        print(mrk, seq)


def _cmd_wav_to_bytes(args):
    from pika_tpu.data.archive import wav_scp_to_bytes

    wav_scp_to_bytes(args.wav_scp, args.byte_file)


def _cmd_split(args):
    from pika_tpu.data.lists import split_by_length

    paths = split_by_length(
        args.feats_len, args.batch_size, args.world_size,
        args.min_len, args.max_len, args.full_batch, args.random, args.seed,
    )
    print("\n".join(paths))


def _cmd_shuffle(args):
    from pika_tpu.data.lists import shuffle_by_length

    shuffle_by_length(
        args.feats_len, args.feats_len_shuffled, args.batch_size,
        args.max_len, args.full_batch, args.random, args.seed,
    )


def _cmd_cmvn(args):
    """Global CMVN over augmented fbank features (compute_global_cmvn.py):
    the same speed/gain perturbation + fbank chain as training, accumulated
    into Kaldi-format stats."""
    from pika_tpu.data import segment as seg
    from pika_tpu.data.archive import MrkSeqReader
    from pika_tpu.data.cmvn import CmvnStats
    from pika_tpu.data.scp import read_data_lst
    from pika_tpu.features.fbank import FbankConfig, fbank_numpy_batch

    if args.feat_config:
        fb = FbankConfig.from_conf(args.feat_config)
    else:
        fb = FbankConfig(sample_frequency=args.sample_rate, window_type="hamming",
                         dither=1.0, low_freq=40.0, high_freq=-200.0,
                         num_mel_bins=args.feat_dim)
    rng = np.random.default_rng(args.seed)
    dither_rng = np.random.default_rng(args.seed + 1) if fb.dither else None
    stats = CmvnStats(fb.num_mel_bins)
    speed_rates = [0.9, 1.0, 1.1]
    triplets = read_data_lst(args.data_lst)
    if not triplets:
        # 2-column fallback (`mrk seq` per line): skip blank/short lines
        # instead of crashing on entry[1], and close the handle
        with open(args.data_lst) as lst_f:
            triplets = [
                (parts[0], parts[1], "")
                for parts in (line.split() for line in lst_f)
                if len(parts) >= 2
            ]
    for entry in triplets:
        mrk_fn, seq_fn = entry[0], entry[1]
        with MrkSeqReader(mrk_fn, seq_fn) as reader:
            for _, pcm in reader:
                x = seg.to_float32(pcm)
                x = seg.change_speed(x, speed_rates[int(rng.integers(0, 3))])
                if not args.no_normalize:
                    x = seg.normalize(x, float(rng.uniform(-55, -10)))
                x16 = seg.from_float32(x, "int16").astype(np.float64)
                # bit-identical vectorized path (fbank_numpy is the
                # per-frame test oracle; corpus-scale prep uses the
                # batched twin — see fbank_numpy_batch's docstring)
                feats = fbank_numpy_batch(x16, fb, dither_rng)
                if args.cmn:
                    feats = feats - feats.mean(axis=0)
                stats.accumulate(feats)
    stats.write(args.cmvn_stats)


def main(argv=None):
    parser = argparse.ArgumentParser(description="pika_tpu data preparation")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("wav_to_seq")
    p.add_argument("wav_scp")
    p.add_argument("out_mrk")
    p.add_argument("out_seq")
    p.add_argument("--num_wav_per_seq", type=int, default=2000)
    p.set_defaults(fn=_cmd_wav_to_seq)

    p = sub.add_parser("wav_to_bytes")
    p.add_argument("wav_scp")
    p.add_argument("byte_file")
    p.set_defaults(fn=_cmd_wav_to_bytes)

    p = sub.add_parser("split_by_length")
    p.add_argument("feats_len")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--world_size", type=int, default=8)
    p.add_argument("--min_len", type=int, default=0)
    p.add_argument("--max_len", type=int, default=3000)
    p.add_argument("--full_batch", action="store_true")
    p.add_argument("--random", action="store_true")
    p.add_argument("--seed", type=int, default=None)
    p.set_defaults(fn=_cmd_split)

    p = sub.add_parser("shuffle_by_length")
    p.add_argument("feats_len")
    p.add_argument("feats_len_shuffled")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--max_len", type=int, default=3000)
    p.add_argument("--full_batch", action="store_true")
    p.add_argument("--random", action="store_true")
    p.add_argument("--seed", type=int, default=None)
    p.set_defaults(fn=_cmd_shuffle)

    p = sub.add_parser("compute_global_cmvn")
    p.add_argument("data_lst")
    p.add_argument("cmvn_stats")
    p.add_argument("--cmn", action="store_true")
    p.add_argument("--sample_rate", type=int, default=16000)
    p.add_argument("--feat_config", type=str, default=None)
    p.add_argument("--feat_dim", type=int, default=80)
    p.add_argument("--seed", type=int, default=777)
    p.add_argument("--no_normalize", action="store_true")
    p.set_defaults(fn=_cmd_cmvn)

    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
