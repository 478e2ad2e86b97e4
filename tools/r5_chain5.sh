#!/bin/bash
# Round-5 chain 5: CLI bench with the new prefetch-overlap stats line
# (proves the H2D issued ahead of consumption — VERDICT r4 item 4's
# acceptance criterion).  Takes the PID of the running chain as $1.
# Usage: bash tools/r5_chain5.sh [wait_pid] > /tmp/r5_chain5.log 2>&1 &
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

run python tools/bench_cli_train.py --utts 400 --epochs 3 --save_interval 3
run python tools/bench_cli_train.py --utts 400 --epochs 3 --save_interval 3

echo "### CHAIN5 DONE $(date -u)"
