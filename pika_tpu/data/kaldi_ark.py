"""Kaldi binary/text archive readers — feature-matrix interchange.

The reference's decode path reads precomputed Kaldi feature archives via
PyKaldi ``SequentialMatrixReader`` (loader/utt_loader.py:9-10,163-164).
For interchange with existing Kaldi data dirs, this module parses the
Kaldi formats natively:

  * binary float/double matrices ("\\0B" + "FM "/"DM " + per-dim
    int32 sizes) and vectors ("FV "/"DV ")
  * text matrices ("[" rows "]")
  * ``ark`` streams of ``uttid <obj>`` records and ``scp`` files of
    ``uttid path:offset`` pointers
"""

from __future__ import annotations

import struct
from typing import Dict, Iterator, Tuple

import numpy as np


def _read_token(f) -> str:
    tok = b""
    while True:
        c = f.read(1)
        if not c or c == b" ":
            break
        tok += c
    return tok.decode()


def _read_basic_int(f) -> int:
    size = f.read(1)[0]
    if size == 4:
        return struct.unpack("<i", f.read(4))[0]
    if size == 8:
        return struct.unpack("<q", f.read(8))[0]
    raise ValueError(f"unexpected int size marker {size}")


def read_kaldi_object(f) -> np.ndarray:
    """Read one Kaldi object (matrix/vector, binary or text) at the
    current position."""
    start = f.read(2)
    if start == b"\0B":
        tok = _read_token(f)
        if tok in ("FM", "DM"):
            dtype = "<f4" if tok == "FM" else "<f8"
            rows = _read_basic_int(f)
            cols = _read_basic_int(f)
            data = np.frombuffer(f.read(rows * cols * np.dtype(dtype).itemsize), dtype=dtype)
            return data.reshape(rows, cols).astype(np.float32)
        if tok in ("FV", "DV"):
            dtype = "<f4" if tok == "FV" else "<f8"
            n = _read_basic_int(f)
            return np.frombuffer(f.read(n * np.dtype(dtype).itemsize), dtype=dtype).astype(np.float32)
        if tok == "CM":
            raise NotImplementedError("compressed Kaldi matrices not supported")
        raise ValueError(f"unknown Kaldi binary object {tok!r}")
    # text object: read until the closing bracket.  The 2-byte binary
    # probe may already contain the opening '[' — count brackets in it
    # too, or the depth match runs to EOF and swallows later records.
    text = start.decode(errors="replace")
    depth = 0
    started = False
    for ch in text:
        if ch == "[":
            depth += 1
            started = True
        elif ch == "]":
            depth -= 1
    while not (started and depth == 0):
        c = f.read(1)
        if not c:
            break
        ch = c.decode(errors="replace")
        text += ch
        if ch == "[":
            depth += 1
            started = True
        elif ch == "]":
            depth -= 1
    rows = [r for r in text.replace("[", " ").replace("]", " ").splitlines() if r.strip()]
    return np.array([[float(x) for x in r.split()] for r in rows], dtype=np.float32)


def iter_matrix_ark(path: str) -> Iterator[Tuple[str, np.ndarray]]:
    """Iterate ``uttid matrix`` records of a Kaldi .ark file."""
    with open(path, "rb") as f:
        while True:
            uttid = b""
            while True:
                c = f.read(1)
                if not c:
                    return
                if c in b" \t":
                    if uttid:
                        break
                    continue  # pad between records
                if c in b"\r\n":
                    # text objects end with ']\n'; the newline belongs to
                    # the previous record, not the next uttid
                    if uttid:
                        raise ValueError(
                            f"malformed ark {path}: uttid {uttid!r} not "
                            "followed by a space")
                    continue
                uttid += c
            yield uttid.decode(), read_kaldi_object(f)


def read_matrix_scp(path: str) -> Dict[str, Tuple[str, int]]:
    """Parse a feats.scp of ``uttid ark_path:byte_offset`` pointers."""
    out = {}
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            parts = line.split()
            if len(parts) != 2:
                continue
            ark, _, off = parts[1].rpartition(":")
            out[parts[0]] = (ark, int(off))
    return out


def read_matrix_at(ark_path: str, offset: int) -> np.ndarray:
    with open(ark_path, "rb") as f:
        f.seek(offset)
        return read_kaldi_object(f)


def iter_matrices_scp(scp_path: str) -> Iterator[Tuple[str, np.ndarray]]:
    for uttid, (ark, off) in read_matrix_scp(scp_path).items():
        yield uttid, read_matrix_at(ark, off)


def write_matrix_ark(path: str, items) -> str:
    """Write ``uttid matrix`` records in Kaldi binary format; also emits a
    companion .scp file.  Returns the scp path."""
    scp_path = path + ".scp"
    with open(path, "wb") as f, open(scp_path, "w", encoding="utf-8") as scp:
        for uttid, mat in items:
            mat = np.asarray(mat, np.float32)
            f.write(uttid.encode() + b" ")
            offset = f.tell()
            f.write(b"\0BFM ")
            f.write(bytes([4]) + struct.pack("<i", mat.shape[0]))
            f.write(bytes([4]) + struct.pack("<i", mat.shape[1]))
            f.write(mat.astype("<f4").tobytes())
            scp.write(f"{uttid} {path}:{offset}\n")
    return scp_path
