#!/bin/bash
# Round-5 chain 3: re-measure the FST-fusion decode benches after the
# cache-as-argument fix (a closed-over 478 MB advance cache was inlined
# into the HLO and blew the tunneled remote-compile payload limit,
# HTTP 413 — r5_chain.log).  Takes the PID of the currently-running
# chain to wait for as $1.
# Usage: bash tools/r5_chain3.sh [wait_pid] > /tmp/r5_chain3.log 2>&1 &
cd "$(dirname $0)/.."
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=$PWD:$PYTHONPATH

if [ -n "$1" ]; then
    echo "### waiting for PID $1 — $(date -u)"
    while [ -e /proc/$1 ]; do sleep 15; done
fi

run () {
    echo "### $* — $(date -u)"
    timeout 3600 "$@"
    echo "### exit $? $(date -u)"
}

# dense-cache per-token fusion (the VERDICT r4 item-2 headline number)
run python tools/bench_decode.py --batch 32 --beam 8 --fst per_token
# per-beam with the cache (also 413'd in chain 1)
run python tools/bench_decode.py --batch 32 --beam 8 --fst per_beam
# cache off (walk + new dedup) for the same-session contrast row
run python tools/bench_decode.py --batch 32 --beam 8 --fst per_token --fst_cache_mb 0

echo "### CHAIN3 DONE $(date -u)"
