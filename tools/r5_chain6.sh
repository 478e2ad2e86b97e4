#!/bin/bash
# Round-5 chain 6: attribute the remaining per-token fused decode cost
# (featurizer+encoder vs beam loop) now that the dense cache removed the
# FST walks.  Takes the PID of the running chain as $1.
# Usage: bash tools/r5_chain6.sh [wait_pid] > /tmp/r5_chain6.log 2>&1 &
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

run python tools/bench_decode.py --batch 32 --beam 8 --fst per_token --attribution
run python tools/bench_decode.py --batch 32 --beam 8 --fst per_beam --attribution

echo "### CHAIN6 DONE $(date -u)"
