"""tools/nbest_oracle.py: oracle-WER bound on both N-best formats.

The grammar quality recipe's rescoring-stage deltas are judged against
this bound (BASELINE.md); the tool must parse both the int-token format
(--output_scores trailing floats) and the concatenated-symbol format
written under --symbols_map.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(tmp_path, nbest_lines, extra=()):
    from pika_tpu.data import write_int_vectors

    # refs: u0 = [1 2 3], u1 = [4 5]
    write_int_vectors(str(tmp_path / "label.txt"),
                      [("u0", [1, 2, 3]), ("u1", [4, 5])])
    with open(tmp_path / "wav.scp", "w") as f:
        f.write("u0 /dev/null\nu1 /dev/null\n")
    with open(tmp_path / "nbest.txt", "w") as f:
        f.write("\n".join(nbest_lines) + "\n")
    r = subprocess.run(
        [sys.executable, f"{REPO}/tools/nbest_oracle.py",
         f"{tmp_path}/nbest.txt", f"ark:{tmp_path}/label.txt",
         f"{tmp_path}/wav.scp", "2", *extra],
        capture_output=True, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", "")})
    assert r.returncode == 0, r.stderr
    return r.stdout.strip()

def test_int_format(tmp_path):
    # u0: 1-best has 1 sub error, 2nd hyp exact; u1: both wrong (1 err best)
    out = _run(tmp_path, [
        "1 2 9 -0.5",   # u0 hyp0: 1 sub
        "1 2 3 -0.9",   # u0 hyp1: exact
        "4 9 -0.4",     # u1 hyp0: 1 sub
        "9 5 -0.8",     # u1 hyp1: 1 sub
    ])
    # 1-best: (1+1)/5 = 40%; oracle: (0+1)/5 = 20%
    assert "1-best WER 40.00%" in out and "oracle-2 WER 20.00%" in out


def test_symbol_format(tmp_path):
    with open(tmp_path / "char.txt", "w") as f:
        f.write("<blk> 0\n")
        for k in range(1, 13):
            f.write(f"w{k} {k}\n")
    # w1/w12 share a prefix: longest-match tokenization must pick w12
    out = _run(tmp_path, [
        "w1w2w3 -0.5",    # u0 hyp0: exact
        "w12w2w3 -0.9",   # u0 hyp1: 1 sub (w12, not w1+w2)
        "w4w5w5 -0.4",    # u1 hyp0: 1 ins
        "w4w5 -0.8",      # u1 hyp1: exact
    ], extra=[f"{tmp_path}/char.txt"])
    # 1-best: (0+1)/5 = 20%; oracle: 0%
    assert "1-best WER 20.00%" in out and "oracle-2 WER 0.00%" in out
