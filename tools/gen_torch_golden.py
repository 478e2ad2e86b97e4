"""Generate a tiny-RNN-T golden fixture with PyTorch — the reference's
actual engine — so pika_tpu's model stack is tested cross-framework
(VERDICT r1 missing #2): torch's cuDNN-convention LSTM, embedding and
linear kernels compute the full joint log-prob lattice and greedy
hypotheses; the JAX side must reproduce them from the same weights.

Mirrors trainer/model/transducer.py semantics exactly:
  * encoder nn.LSTM over packed sequences (:38-51,82-86)
  * prediction net: Embedding(V+1, padding_idx=-1) + nn.LSTM over
    [SOS=blank(0)] + labels (:55-68,88-97)
  * joint: fc2( tanh(fc1([x;y])) * sigmoid(fc_gate([x;y])) ) with
    log_softmax (:98-111)
  * greedy: advance time on blank, prediction net on emission
    (decoder/transducer_decoder.py:126-150 at beam 1)

Usage:  PYTHONPATH=. python tools/gen_torch_golden.py
Writes tests/golden/rnnt_tiny_torch.npz
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import numpy as np
import torch

OUT = "tests/golden/rnnt_tiny_torch.npz"

B, T, D, H, V, E, U = 3, 12, 10, 16, 8, 6, 5
LAYERS = 2


def main():
    torch.manual_seed(1234)
    enc = torch.nn.LSTM(D, H, num_layers=LAYERS, batch_first=True)
    embed = torch.nn.Embedding(V + 1, E, padding_idx=V)
    dec = torch.nn.LSTM(E, H, num_layers=LAYERS, batch_first=True)
    fc1 = torch.nn.Linear(2 * H, H)
    fc_gate = torch.nn.Linear(2 * H, H)
    fc2 = torch.nn.Linear(H, V)
    # non-degenerate padding row (the default is zeros; keep it non-zero so
    # the test would catch a wrong padding_idx mapping)
    with torch.no_grad():
        embed.weight[V] = torch.randn(E) * 0.1
        # bias blank up so greedy emits a realistic mix of symbols and
        # blanks (exercising both time- and prediction-net advancement)
        # instead of railing against the symbol cap
        fc2.bias[0] += 0.4

    rng = np.random.default_rng(77)
    x = rng.standard_normal((B, T, D)).astype(np.float32)
    x_len = np.asarray([T, 9, 7], np.int32)
    y = rng.integers(1, V, (B, U)).astype(np.int32)
    y_len = np.asarray([U, 4, 2], np.int32)
    # loader-style padding: positions >= y_len are blank(0)
    for b in range(B):
        y[b, y_len[b]:] = 0

    with torch.no_grad():
        packed = torch.nn.utils.rnn.pack_padded_sequence(
            torch.from_numpy(x), x_len, batch_first=True, enforce_sorted=False)
        enc_out, _ = enc(packed)
        enc_out, _ = torch.nn.utils.rnn.pad_packed_sequence(
            enc_out, batch_first=True, total_length=T)

        sos = torch.zeros((B, 1), dtype=torch.long)
        y_in = torch.cat([sos, torch.from_numpy(y).long()], dim=1)
        dec_out, _ = dec(embed(y_in))

        j = torch.cat([
            enc_out[:, :, None, :].expand(B, T, U + 1, H),
            dec_out[:, None, :, :].expand(B, T, U + 1, H),
        ], dim=-1)
        logits = fc2(torch.tanh(fc1(j)) * torch.sigmoid(fc_gate(j)))
        logprobs = torch.log_softmax(logits, dim=-1).numpy()

        # greedy decode, one utterance at a time (blank advances time,
        # emission advances the prediction net), symbol cap 2*U
        hyps = np.full((B, 2 * U), -1, np.int32)
        hyp_lens = np.zeros(B, np.int32)
        for b in range(B):
            h = torch.zeros((LAYERS, 1, H))
            c = torch.zeros((LAYERS, 1, H))
            dec_hid, (h, c) = dec(embed(torch.zeros((1, 1), dtype=torch.long)), (h, c))
            t = 0
            n = 0
            while t < int(x_len[b]):
                cat = torch.cat([enc_out[b, t][None], dec_hid[0, 0][None]], dim=-1)
                logit = fc2(torch.tanh(fc1(cat)) * torch.sigmoid(fc_gate(cat)))
                tok = int(torch.argmax(logit, dim=-1))
                if n >= 2 * U:  # symbol cap forces blank (greedy.py semantics)
                    tok = 0
                if tok == 0:
                    t += 1
                else:
                    hyps[b, n] = tok
                    n += 1
                    dec_hid, (h, c) = dec(
                        embed(torch.tensor([[tok]], dtype=torch.long)), (h, c))
            hyp_lens[b] = n

    out = {
        "x": x, "x_len": x_len, "y": y, "y_len": y_len,
        "logprobs": logprobs, "greedy_hyps": hyps, "greedy_lens": hyp_lens,
        "embed_weight": embed.weight.detach().numpy(),
        "fc1_weight": fc1.weight.detach().numpy(),
        "fc1_bias": fc1.bias.detach().numpy(),
        "fc_gate_weight": fc_gate.weight.detach().numpy(),
        "fc_gate_bias": fc_gate.bias.detach().numpy(),
        "fc2_weight": fc2.weight.detach().numpy(),
        "fc2_bias": fc2.bias.detach().numpy(),
    }
    for name, mod in (("enc", enc), ("dec", dec)):
        for k in range(LAYERS):
            out[f"{name}_wih_l{k}"] = getattr(mod, f"weight_ih_l{k}").detach().numpy()
            out[f"{name}_whh_l{k}"] = getattr(mod, f"weight_hh_l{k}").detach().numpy()
            out[f"{name}_b_l{k}"] = (
                getattr(mod, f"bias_ih_l{k}") + getattr(mod, f"bias_hh_l{k}")
            ).detach().numpy()

    np.savez(OUT, **out)
    print(f"wrote {OUT}: logprobs {logprobs.shape}, greedy lens {hyp_lens}")


if __name__ == "__main__":
    main()
