"""Multi-host (2-process) training parity.

The reference trains all three trainers multi-node via
``torch.distributed.launch --nnodes`` + NCCL (the commented template at
/root/reference/egs/train_transducer_mbr_bmuf_otfaug.sh:37 and
trainer/bmuf.py:59).  The TPU-native equivalent is ``jax.distributed``:
every host runs the SAME training command with its own ``--process_id``
and the device mesh spans the pod.

These tests launch TWO real OS processes (4 virtual CPU devices each,
gloo cross-process collectives) through the actual trainer CLIs and
assert the resulting parameters match a single-process 8-device run of
the identical program.  This is the strongest no-cluster evidence that
the SPMD programs are topology-independent: same mesh shape, different
process boundaries, same result.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from pika_tpu.data.kaldi_ark import write_matrix_ark
from pika_tpu.data import write_int_vectors
from pika_tpu.models.transducer import TransducerConfig, init_transducer
from pika_tpu.train.bundle import load_bundle, save_bundle

VOCAB = 6
FEAT_DIM = 8
N_UTTS = 16


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _make_feats_corpus(tmp_path, rng):
    """Deterministic precomputed-feature corpus (--loader utt): every
    process reads the same arks with the same seed, so all hosts see the
    same global batch stream — the multi-host data contract."""
    items, labels = [], []
    for i in range(N_UTTS):
        t = int(rng.integers(8, 12))
        items.append((f"utt{i}", rng.standard_normal((t, FEAT_DIM)).astype(np.float32)))
        labels.append((f"utt{i}", rng.integers(1, VOCAB, 3).tolist()))
    write_matrix_ark(str(tmp_path / "feats.ark"), items)
    write_int_vectors(str(tmp_path / "label.txt"), labels)


FLAGS_COMMON = [
    "--loader", "utt", "--feats_dim", str(FEAT_DIM),
    "--lctx", "0", "--rctx", "0", "--stride", "1",
    "--batch_size", "1", "--num_devices", "8", "--num_workers", "1",
    "--output_dim", str(VOCAB),
    "--enc_layers", "1", "--dec_layers", "1",
    "--rnn_size", "16", "--embd_dim", "8", "--dropout", "0.0",
    "--optim", "sgd", "--initial_lr", "0.05", "--final_lr", "0.05",
    "--grad_clip", "3.0", "--num_epochs", "1",
    "--num_batches_per_epoch", "2", "--seed", "3",
]

TRANSDUCER_FLAGS = ["--encoder_type", "rnn", "--decoder_type", "rnn"]

LAS_FLAGS = [
    "--SOS", "0", "--EOS", str(VOCAB),
    "--padding_tgt", str(VOCAB + 1), "--padding_idx", str(VOCAB + 1),
    "--output_dim", str(VOCAB + 1), "--global_attention", "mlp",
]


def _argv(trainer, tmp_path, out, mode, extra):
    d = str(tmp_path)
    base = [f"{d}/feats.ark", f"{d}/{out}.WORKER-ID.log", f"{d}/{out}",
            "--ali_rspec", f"ark:{d}/label.txt",
            *FLAGS_COMMON, "--dp_mode", mode]
    if mode != "sync":
        base += ["--sync_period", "2", "--block_momentum", "0.5"]
    if trainer == "transducer":
        base += [*TRANSDUCER_FLAGS, "--steps_per_dispatch", "1"]
    elif trainer == "mbr":
        base += [*TRANSDUCER_FLAGS, "--init_model", f"{d}/init_bundle",
                 "--beam_size", "2", "--decode_max_symbols", "4",
                 "--rnnt_scale", "0.1"]
    elif trainer == "las":
        base += LAS_FLAGS
    return base


def _run_single(trainer, tmp_path, out, mode, extra=()):
    """Single-process 8-device reference run, in this pytest process."""
    if trainer == "transducer":
        from pika_tpu.train.train_transducer import main
    elif trainer == "mbr":
        from pika_tpu.train.train_mbr import main
    else:
        from pika_tpu.train.train_las import main
    main(_argv(trainer, tmp_path, out, mode, extra))


def _run_two_procs(trainer, tmp_path, out, mode, extra=()):
    """The same program as two OS processes x 4 local CPU devices."""
    port = _free_port()
    mod = {"transducer": "pika_tpu.train.train_transducer",
           "mbr": "pika_tpu.train.train_mbr",
           "las": "pika_tpu.train.train_las"}[trainer]
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        # disable the axon PJRT register hook: it clobbers XLA_FLAGS
        "PALLAS_AXON_POOL_IPS": "",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "PYTHONPATH": repo_root + os.pathsep + os.environ.get("PYTHONPATH", ""),
    }
    procs = []
    for pid in (0, 1):
        argv = _argv(trainer, tmp_path, out, mode, extra) + [
            "--coordinator_address", f"127.0.0.1:{port}",
            "--num_processes", "2", "--process_id", str(pid),
        ]
        procs.append(subprocess.Popen(
            [sys.executable, "-m", mod, *argv],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=str(tmp_path)))
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, (
            f"{trainer}/{mode} process failed:\n{o.decode()[-4000:]}")


def _params(bundle_dir):
    _, variables, _ = load_bundle(str(bundle_dir))
    return variables["params"]


def _assert_close(pa, pb, what):
    import jax
    flat_a = jax.tree_util.tree_leaves_with_path(pa)
    flat_b = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(pb)}
    assert len(flat_a) == len(flat_b)
    for k, va in flat_a:
        vb = flat_b[jax.tree_util.keystr(k)]
        np.testing.assert_allclose(
            np.asarray(va), np.asarray(vb), rtol=2e-4, atol=2e-5,
            err_msg=f"{what}: {jax.tree_util.keystr(k)}")


def _prep(tmp_path, with_init=False):
    rng = np.random.default_rng(5)
    _make_feats_corpus(tmp_path, rng)
    if with_init:
        cfg = TransducerConfig(
            input_dim=FEAT_DIM, vocab_size=VOCAB, hid_dim=16,
            encoder_type="rnn", decoder_type="rnn",
            enc_layers=1, dec_layers=1, embd_dim=8,
        )
        import jax
        model, variables = init_transducer(jax.random.PRNGKey(3), cfg)
        save_bundle(str(tmp_path / "init_bundle"), "transducer", cfg,
                    {"params": jax.device_get(variables["params"])})


@pytest.mark.slow
@pytest.mark.parametrize("trainer,mode", [
    ("transducer", "sync"),
    ("transducer", "bmuf"),
    ("mbr", "sync"),
    ("las", "bmuf"),
])
def test_two_process_parity(tmp_path, trainer, mode):
    _prep(tmp_path, with_init=(trainer == "mbr"))
    _run_single(trainer, tmp_path, f"single_{mode}", mode)
    _run_two_procs(trainer, tmp_path, f"multi_{mode}", mode)
    single = _params(tmp_path / f"single_{mode}" / "model.epoch.0")
    multi = _params(tmp_path / f"multi_{mode}" / "model.epoch.0")
    _assert_close(single, multi, f"{trainer}/{mode}")
