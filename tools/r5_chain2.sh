#!/bin/bash
# Round-5 follow-up chip chain: CLI sustained-throughput re-measure after
# the H2D-overlap change (stack+device_put on the prefetch thread).
# Takes the PID of the currently-running chain to wait for as $1.
# Usage: bash tools/r5_chain2.sh [wait_pid] > /tmp/r5_chain2.log 2>&1 &
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

# CLI sustained training throughput, 3 repeats (VERDICT r4 item 4:
# median±spread after completing the H2D overlap)
run python tools/bench_cli_train.py --utts 400 --epochs 3 --save_interval 3
run python tools/bench_cli_train.py --utts 400 --epochs 3 --save_interval 3
run python tools/bench_cli_train.py --utts 400 --epochs 3 --save_interval 3

echo "### CHAIN2 DONE $(date -u)"
