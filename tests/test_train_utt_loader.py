"""Training from precomputed features (--loader utt).

The reference's trainers select the loader module by string
(trainer/train_transducer_bmuf_otfaug.py:258-263), so `--loader utt`
trains from Kaldi feature archives (loader/utt_loader.py) instead of the
on-the-fly waveform path.  These tests cover the pika_tpu equivalent:
feats.ark + label ark → fused CMVN/SpecAugment/model/loss step.
"""

import os

import numpy as np
import pytest

from pika_tpu.data import write_int_vectors
from pika_tpu.data.feats_loader import FeatsLoaderConfig, feats_dataloader, _shuffled
from pika_tpu.data.kaldi_ark import write_matrix_ark
from pika_tpu.train.train_transducer import main as train_main
from pika_tpu.train.eval_transducer import main as eval_main

VOCAB = 5
DIM = 8


def _make_feats_corpus(tmp_path, n_utts, rng):
    """Features where each label k paints a distinct block pattern — a task
    a tiny model can learn from features alone."""
    items, labels = [], []
    for i in range(n_utts):
        toks = rng.integers(1, VOCAB, int(rng.integers(2, 4)))
        frames = []
        for t in toks:
            block = np.zeros((6, DIM), np.float32)
            block[:, int(t)] = 4.0
            frames.append(block + 0.05 * rng.standard_normal((6, DIM)))
        items.append((f"utt{i}", np.concatenate(frames).astype(np.float32)))
        labels.append((f"utt{i}", [int(t) for t in toks]))
    write_matrix_ark(str(tmp_path / "feats.ark"), items)
    write_int_vectors(str(tmp_path / "label.txt"), labels)
    return items, labels


def test_shuffled_buffer_covers_all_items():
    items = list(range(100))
    out = list(_shuffled(iter(items), buffer_size=16, seed=3))
    assert sorted(out) == items
    assert out != items  # actually shuffled
    # deterministic given the seed
    assert out == list(_shuffled(iter(items), buffer_size=16, seed=3))


def test_feats_dataloader_shuffles_between_epochs(tmp_path, rng):
    _make_feats_corpus(tmp_path, 12, rng)
    cfg = FeatsLoaderConfig(batch_size=4, lctx=0, rctx=0, stride=1,
                            shuffle_buffer=8, seed=1)
    order1 = [u for b in feats_dataloader(str(tmp_path / "feats.ark"),
                                          f"ark:{tmp_path}/label.txt", cfg)
              for u in b["uttids"]]
    cfg2 = FeatsLoaderConfig(batch_size=4, lctx=0, rctx=0, stride=1,
                             shuffle_buffer=8, seed=2)
    order2 = [u for b in feats_dataloader(str(tmp_path / "feats.ark"),
                                          f"ark:{tmp_path}/label.txt", cfg2)
              for u in b["uttids"]]
    assert sorted(order1) == sorted(order2)
    assert order1 != order2


@pytest.mark.slow
def test_train_from_precomputed_features(tmp_path, rng):
    _make_feats_corpus(tmp_path, 16, rng)
    d = str(tmp_path)
    os.makedirs(f"{d}/exp")
    flags = [
        f"{d}/feats.ark", f"{d}/train.log", f"{d}/exp",
        "--loader", "utt", "--ali_rspec", f"ark:{d}/label.txt",
        "--feats_dim", str(DIM), "--lctx", "1", "--rctx", "1", "--stride", "1",
        "--batch_size", "4", "--buffer_size", "8",
        "--encoder_type", "rnn", "--decoder_type", "rnn",
        "--enc_layers", "1", "--dec_layers", "1",
        "--rnn_size", "32", "--embd_dim", "12",
        "--output_dim", str(VOCAB), "--dropout", "0.0",
        "--optim", "adam", "--initial_lr", "0.01", "--final_lr", "0.005",
        "--grad_clip", "3.0", "--num_epochs", "30",
        "--num_batches_per_epoch", "4",
        "--dp_mode", "sync", "--num_devices", "2",
    ]
    train_main(flags)
    log = open(f"{d}/train.log").read()
    assert "Training Finished" in log
    assert os.path.exists(f"{d}/exp/model.epoch.29/model.json")
    # the loss must actually fall: compare first and last epoch summaries
    sums = [float(l.split("Overall Avg Loss:")[1].split()[0])
            for l in log.splitlines() if "Overall Avg Loss:" in l]
    assert len(sums) >= 2 and sums[-1] < 0.5 * sums[0], sums

    # decode the same precomputed features with the trained model
    wer = eval_main([
        f"{d}/exp/model.epoch.29", f"{d}/feats.ark", f"{d}/nbest.txt",
        "--loader", "utt", "--ref_labels", f"ark:{d}/label.txt",
        "--feats_dim", str(DIM), "--lctx", "1", "--rctx", "1", "--stride", "1",
        "--batch_size", "4", "--beam_size", "2", "--n_best", "1",
        "--max_symbols", "6",
    ])
    assert wer is not None and wer < 0.25, f"WER too high: {wer}"
