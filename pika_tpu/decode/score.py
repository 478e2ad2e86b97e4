"""WER/CER scoring CLI — Kaldi compute-wer equivalent
(egs/eval_transducer.sh:126-127).

    python -m pika_tpu.decode.score ref.txt hyp.txt [--char]

Files are ``uttid token token ...`` per line; ``--char`` splits each
token into characters first (the CER path of the recipe, which char-splits
the reference before scoring, eval_transducer.sh:110-125).
"""

from __future__ import annotations

import argparse
import sys

from pika_tpu.decode.wer import score_wer


def _read(path: str, char: bool):
    out = {}
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            toks = parts[1:]
            if char:
                toks = [c for t in toks for c in t]
            out[parts[0]] = toks
    return out


def main(argv=None):
    parser = argparse.ArgumentParser(description="WER/CER scoring")
    parser.add_argument("ref")
    parser.add_argument("hyp")
    parser.add_argument("--char", action="store_true", help="score characters")
    args = parser.parse_args(argv)
    refs = _read(args.ref, args.char)
    hyps = _read(args.hyp, args.char)
    wer, c = score_wer(refs, hyps)
    if c["unmatched_hyps"]:
        print(f"WARNING: {c['unmatched_hyps']} hypothesis utterances have "
              "no reference and were not scored — check id formats",
              file=sys.stderr)
    print(
        f"%WER {wer * 100:.2f} [ {c['errors']} / {c['words']}, "
        f"{c['ins']} ins, {c['del']} del, {c['sub']} sub ]"
    )
    print(f"%SER {c['sent_err'] / max(1, c['sents']) * 100:.2f} [ {c['sent_err']} / {c['sents']} ]")
    return wer


def cli():
    """Console-script entry: main() returns the WER for programmatic use,
    which sys.exit() would misread as a failing exit status."""
    main()
    return 0


if __name__ == "__main__":
    main()
