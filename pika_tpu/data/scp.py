"""Parsers for the PIKA/Kaldi text data layout — no Kaldi dependency.

Covers every text format the reference consumes or produces:
  * ``wav.scp``            — ``uttid path-or-pipe`` lines
  * ``label.txt`` arks     — Kaldi text int-vector archives: ``uttid 3 17 9``
    (read in the reference via PyKaldi ``SequentialIntVectorReader``,
    loader/otf_utt_loader.py:17,209)
  * symbol tables          — ``symbol id`` per line (decoder/decode_transducer.py:101-105)
  * data ``.lst`` triplets — ``mrk seq ark:label`` per line
    (loader/otf_utt_loader.py:125-130)
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Tuple

import numpy as np


def read_wav_scp(path: str) -> Dict[str, str]:
    """Read wav.scp → ordered {uttid: path_or_pipe}."""
    out: Dict[str, str] = {}
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            uttid, rest = line.split(None, 1)
            out[uttid] = rest
    return out


def iter_int_vectors(rspec: str) -> Iterator[Tuple[str, np.ndarray]]:
    """Iterate a Kaldi *text* int-vector archive.

    Accepts a plain filename or a Kaldi rspecifier of the form
    ``ark:filename`` / ``ark,t:filename`` (the only forms the reference's
    recipes use for labels, egs/train_transducer_bmuf_otfaug.sh:121-131).
    """
    path = rspec.rsplit(":", 1)[-1]
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            yield parts[0], np.array([int(x) for x in parts[1:]], dtype=np.int32)


def read_int_vectors(rspec: str) -> Dict[str, np.ndarray]:
    return dict(iter_int_vectors(rspec))


def write_int_vectors(path: str, items) -> None:
    with open(path, "w", encoding="utf-8") as f:
        for uttid, vec in items:
            f.write(uttid + " " + " ".join(str(int(x)) for x in vec) + "\n")


def read_symbol_table(path: str) -> Dict[int, str]:
    """Read a ``symbol id`` table → {id: symbol} for detokenization
    (mirrors decoder/decode_transducer.py:101-105)."""
    table: Dict[int, str] = {}
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            parts = line.split()
            if len(parts) != 2:
                continue
            table[int(parts[1])] = parts[0]
    return table


def read_data_lst(path: str) -> List[Tuple[str, str, str]]:
    """Read a data .lst of ``mrk seq label_rspec`` triplets."""
    triplets = []
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 3:
                triplets.append((parts[0], parts[1], parts[2]))
    return triplets
