"""Standalone N-best rerank CLI — egs/local/nbest_rerank.py equivalent.

Consumes the N-best text files written by eval_transducer (reference
format: ``hyp rnnt_score [fw_tok_scores...] [bw_tok_scores...]`` per line,
N lines per utterance, decode_transducer.py:165-178) and writes the best
hypothesis per utterance after length-normalized score fusion.

    python -m pika_tpu.decode.rerank in_nbest out_hyp --nbest 8 \
        [--las_rescore] [--rnnt_score_scale 1.0] \
        [--las_fw_score_scale 0.3] [--las_bw_score_scale 0.7]
"""

from __future__ import annotations

import argparse


def rerank_file(
    in_hyp: str,
    out_hyp: str,
    nbest: int,
    las_rescore: bool = False,
    rnnt_score_scale: float = 1.0,
    las_fw_score_scale: float = 0.3,
    las_bw_score_scale: float = 0.7,
) -> None:
    with open(in_hyp, "r", encoding="utf-8") as in_f, \
         open(out_hyp, "w", encoding="utf-8") as out_f:
        cur = 0
        hyp_score = []
        empty_hyp_len = 3 if las_rescore else 1
        for line in in_f:
            parts = line.split()
            if len(parts) <= empty_hyp_len:
                hyp = ""
                score = rnnt_score_scale * float(parts[0])
                if las_rescore and len(parts) >= 3:
                    score += las_fw_score_scale * float(parts[1])
                    score += las_bw_score_scale * float(parts[2])
            else:
                hyp = parts[0].replace("<unk>", " ")
                score = rnnt_score_scale * float(parts[1])
                if las_rescore:
                    num_scores = len(parts) - 2
                    fw = sum(float(s) for s in parts[2 : 2 + num_scores // 2])
                    bw = sum(float(s) for s in parts[2 + num_scores // 2 :])
                    score += las_fw_score_scale * fw + las_bw_score_scale * bw
            norm = 0.001 if len(hyp) == 0 else len(hyp)
            hyp_score.append((-score / norm, hyp))
            cur += 1
            if cur == nbest:
                hyp_score.sort(key=lambda x: x[0])
                out_f.write(" ".join(list(hyp_score[0][1])) + "\n")
                cur = 0
                hyp_score = []


def main(argv=None):
    parser = argparse.ArgumentParser(description="rerank an N-best list")
    parser.add_argument("in_hyp")
    parser.add_argument("out_hyp")
    parser.add_argument("--nbest", type=int, required=True)
    parser.add_argument("--las_rescore", action="store_true")
    parser.add_argument("--rnnt_score_scale", type=float, default=1.0)
    parser.add_argument("--las_fw_score_scale", type=float, default=0.3)
    parser.add_argument("--las_bw_score_scale", type=float, default=0.7)
    args = parser.parse_args(argv)
    rerank_file(args.in_hyp, args.out_hyp, args.nbest, args.las_rescore,
                args.rnnt_score_scale, args.las_fw_score_scale, args.las_bw_score_scale)


if __name__ == "__main__":
    main()
