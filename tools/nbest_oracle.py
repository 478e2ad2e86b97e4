"""Oracle WER of an N-best file — the rescoring headroom bound.

Any N-best rescorer (LAS fw/bw, LM rerank) can at best pick the
lowest-error hypothesis per utterance; this reports that bound next to
the 1-best WER so rescoring-stage deltas can be judged against what was
achievable.

  python tools/nbest_oracle.py NBEST_FILE ark:labels.txt wav.scp N_BEST \
      [symbols_map]

With a symbols_map (the --symbols_map file the decode ran with), the
N-best lines are concatenated symbol strings (the reference's
Mandarin-char convention); they are re-tokenized by longest-match
against the symbol inventory and mapped back to ids.
"""

from __future__ import annotations
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import re
import sys


def main():
    nbest_path, labels_rspec, wav_scp, n_best = (
        sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4]))
    sym_inv = None
    if len(sys.argv) > 5:
        sym_inv = {}
        for line in open(sys.argv[5], encoding="utf-8"):
            w, i = line.split()
            sym_inv[w] = i
        sym_re = re.compile("|".join(
            re.escape(w) for w in sorted(sym_inv, key=len, reverse=True)))

    from pika_tpu.data.scp import read_int_vectors, read_wav_scp
    from pika_tpu.decode.wer import score_wer

    scp = read_wav_scp(wav_scp)
    refs = read_int_vectors(labels_rspec)
    lines = open(nbest_path).read().splitlines()
    if len(lines) != n_best * len(scp):
        raise SystemExit(
            f"{nbest_path}: {len(lines)} lines != {n_best} x {len(scp)} utts")

    o_refs, o_hyps, f_hyps = {}, {}, {}
    for i, utt in enumerate(scp):
        ref = [str(x) for x in refs[utt]]
        best = None
        for j in range(n_best):
            parts = lines[i * n_best + j].split()
            if sym_inv is not None:
                text = parts[0] if parts else ""
                toks = [sym_inv[w] for w in sym_re.findall(text)]
            else:
                # hypothesis tokens are small ints; trailing fields are
                # float scores (--output_scores)
                toks = []
                for p in parts:
                    if "." in p or not p.lstrip("-").isdigit():
                        break
                    toks.append(p)
            _, c = score_wer({utt: ref}, {utt: toks})
            if j == 0:
                f_hyps[utt] = toks
            if best is None or c["errors"] < best[0]:
                best = (c["errors"], toks)
        o_refs[utt], o_hyps[utt] = ref, best[1]

    wer1, c1 = score_wer(o_refs, f_hyps)
    wero, co = score_wer(o_refs, o_hyps)
    print(f"1-best WER {wer1 * 100:.2f}% [{c1['errors']}/{c1['words']}]  "
          f"oracle-{n_best} WER {wero * 100:.2f}% [{co['errors']}/{co['words']}]")


if __name__ == "__main__":
    main()
