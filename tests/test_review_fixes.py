"""Regression tests for the round-1 code-review findings."""

import struct

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from pika_tpu.parallel import BMUFConfig, bmuf_init, make_bmuf_round, make_mesh
from pika_tpu.train.lr import exp_interp_schedule
from pika_tpu.train.step import cast_floats


def test_bmuf_schedule_advances_across_rounds(rng):
    """The LR schedule must see the global batch count, not restart at 0
    each sync period (reference recomputes LR from num_batches_processed,
    train_transducer_bmuf_otfaug.py:115-123)."""
    mesh = make_mesh(8)
    sched = exp_interp_schedule(1.0, 0.01, 100)
    lr_seen = []

    def record_sched(count):
        return sched(count)

    tx = optax.sgd(record_sched)
    cfg = BMUFConfig(variant="bmuf", block_momentum=0.0, block_lr=1.0, sync_period=2)
    w0 = np.ones(2, np.float32)
    state = bmuf_init({"w": jnp.asarray(w0)}, cfg)

    def local_step(params, opt_state, extra, batch, key):
        def loss_fn(p):
            return 0.5 * jnp.sum((p["w"][None, :] - batch) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, extra, {"loss": loss}

    round_fn = make_bmuf_round(local_step, tx.init, cfg, mesh)
    target = np.zeros((2, 8, 2), np.float32)  # sync=2 batches, 8 devices

    # round at step 0 and round at step 50 must apply different LRs.
    s1, _, _, _ = round_fn(state, (), jnp.asarray(target), jax.random.PRNGKey(0), 0)
    s2, _, _, _ = round_fn(state, (), jnp.asarray(target), jax.random.PRNGKey(0), 50)
    d1 = np.abs(np.asarray(s1.params["w"]) - w0).sum()
    d2 = np.abs(np.asarray(s2.params["w"]) - w0).sum()
    assert d1 > 0 and d2 > 0
    # lr(50)/lr(0) = 0.01^(50/100) = 0.1 → the update magnitudes must differ
    assert d2 < d1 * 0.5, (d1, d2)


def test_loader_tops_up_filtered_utterances(tmp_path, rng):
    """Utterances rejected by filters must not shrink batches — the stream
    tops up so every non-tail batch is full."""
    from pika_tpu.data import MrkSeqWriter, write_int_vectors
    from pika_tpu.data.loader import OtfLoaderConfig, dataloader

    with MrkSeqWriter(str(tmp_path / "a.mrk"), str(tmp_path / "a.seq")) as w:
        for i in range(12):
            # every third utterance is too long for the bucket ladder
            n = 40000 if i % 3 == 0 else 8000
            w.write(f"u{i}", (rng.standard_normal(n) * 3000).astype(np.int16))
    write_int_vectors(str(tmp_path / "l.txt"), [(f"u{i}", [1, 2]) for i in range(12)])
    with open(tmp_path / "d.lst", "w") as f:
        f.write(f"{tmp_path}/a.mrk.0 {tmp_path}/a.seq.0 ark:{tmp_path}/l.txt\n")
    cfg = OtfLoaderConfig(batch_size=4, num_workers=1, augment=False, seed=1,
                          wav_buckets=(16000,), label_buckets=(8,))
    batches = list(dataloader(str(tmp_path / "d.lst"), cfg))
    # 8 of 12 survive → one full batch of 4 + tail of 4
    sizes = sorted(len(b["uttids"]) for b in batches)
    assert sum(sizes) == 8
    assert sizes[-1] == 4 and sizes[0] == 4


def test_wavio_extensible_float(tmp_path, rng):
    """WAVE_FORMAT_EXTENSIBLE with an IEEE-float sub-format must decode as
    float, not be reinterpreted as int PCM."""
    from pika_tpu.data.wavio import read_wav

    samples = (rng.standard_normal(100) * 0.1).astype("<f4")
    body = samples.tobytes()
    # build an extensible fmt chunk: cbSize=22, sub-format GUID for float (3)
    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 16000, 16000 * 4, 4, 32)
    fmt += struct.pack("<HHI", 22, 32, 0x4)
    fmt += struct.pack("<H", 3) + b"\x00\x00" + b"\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
    data = b"RIFF" + struct.pack("<I", 36 + len(fmt) + len(body)) + b"WAVE"
    data += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    data += b"data" + struct.pack("<I", len(body)) + body
    out, rate = read_wav(data)
    assert rate == 16000
    np.testing.assert_allclose(out, samples, rtol=1e-6)


def test_cast_floats_roundtrip():
    tree = {"a": jnp.ones(3, jnp.float32), "b": jnp.ones(2, jnp.int32)}
    bf = cast_floats(tree, jnp.bfloat16)
    assert bf["a"].dtype == jnp.bfloat16 and bf["b"].dtype == jnp.int32
    back = cast_floats(bf, jnp.float32)
    assert back["a"].dtype == jnp.float32, "bf16 → f32 cast-back must not be a no-op"


def test_las_both_gate_matches_reference(rng):
    """BothContextGate: tanh((1-z)*target + z*source) (context_gate.py:86-88)."""
    from pika_tpu.models.las import LAS, LASConfig, init_las

    cfg = LASConfig(input_dim=4, output_dim=6, pad_idx=6, rnn_size=8,
                    enc_layers=1, dec_layers=1, embd_dim=4, context_gate="both")
    model, variables = init_las(jax.random.PRNGKey(0), cfg)
    bound = model.bind(variables)
    emb_feed = jnp.asarray(rng.standard_normal((2, 12)).astype(np.float32))
    dec = jnp.asarray(rng.standard_normal((2, 8)).astype(np.float32))
    attn = jnp.asarray(rng.standard_normal((2, 8)).astype(np.float32))
    got = np.asarray(bound._apply_gate(emb_feed, dec, attn))
    p = variables["params"]
    z = 1 / (1 + np.exp(-(np.concatenate([emb_feed, dec, attn], -1) @ np.asarray(p["gate_w"]) + np.asarray(p["gate_b"]))))
    src = np.asarray(attn) @ np.asarray(p["gate_src_w"]) + np.asarray(p["gate_src_b"])
    tgt = np.concatenate([emb_feed, dec], -1) @ np.asarray(p["gate_tgt_w"]) + np.asarray(p["gate_tgt_b"])
    expected = np.tanh((1 - z) * tgt + z * src)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_compilation_cache_skipped_on_cpu(monkeypatch, tmp_path):
    """XLA:CPU persistent-cache entries are AOT machine code not keyed by
    host CPU features; under a remote-compile hook they can be produced on
    a different machine and wedge a local CPU-mesh run on reload (observed
    as a collective-rendezvous abort in the 8-device dryrun).  The cache
    must therefore stay TPU-only: a no-op when the platform is cpu."""
    import jax

    from pika_tpu.utils.cache import enable_compilation_cache

    monkeypatch.setenv("PIKA_CACHE_DIR", str(tmp_path / "xla"))
    before = jax.config.jax_compilation_cache_dir
    enable_compilation_cache()  # conftest pins jax_platforms to "cpu"
    assert jax.config.jax_compilation_cache_dir == before
    assert not (tmp_path / "xla").exists()


def test_stack_batches_pads_labels_with_pad_idx():
    """BMUF stacks a sync period of host batches, padding narrower label
    buckets to the widest; LAS targets must widen with pad_idx (las_loss
    masks by != pad_idx), not 0 — zero-fill counted padding as real
    token-0 targets and corrupted the NLL gradient."""
    import numpy as np

    from pika_tpu.train.train_transducer import _stack_batches

    pad = 32
    b1 = {"labels": np.full((2, 3), 5, np.int32), "lens": np.array([3, 3])}
    b2 = {"labels": np.full((2, 5), 7, np.int32), "lens": np.array([5, 5])}
    out = _stack_batches([b1, b2], pad_values={"labels": pad})
    assert out["labels"].shape == (2, 2, 5)
    assert (out["labels"][0, :, 3:] == pad).all()   # widened with pad_idx
    assert (out["labels"][1] == 7).all()            # untouched
    # default fill stays 0 (transducer labels mask by label_lens)
    out0 = _stack_batches([b1, b2])
    assert (out0["labels"][0, :, 3:] == 0).all()


def test_honor_platforms_env(monkeypatch):
    """A platform-plugin hook that rewrites jax_platforms must not override
    an explicit JAX_PLATFORMS in the environment (a CPU-pinned subprocess
    otherwise initializes the remote backend and hangs with the transport)."""
    import jax

    from pika_tpu.utils.platform import honor_platforms_env

    orig = jax.config.jax_platforms
    try:
        # hook injected a platform the env never named -> env re-asserted
        monkeypatch.setenv("JAX_PLATFORMS", "cpu")
        jax.config.update("jax_platforms", "axon,cpu")
        honor_platforms_env()
        assert jax.config.jax_platforms == "cpu"
        # config == env -> no-op
        honor_platforms_env()
        assert jax.config.jax_platforms == "cpu"
        # env unset -> untouched even with a hook value
        monkeypatch.delenv("JAX_PLATFORMS")
        jax.config.update("jax_platforms", "axon,cpu")
        honor_platforms_env()
        assert jax.config.jax_platforms == "axon,cpu"
    finally:
        jax.config.update("jax_platforms", orig)
