#!/bin/bash
# Round-5 chain 4: headline bench under the shipped auto policy
# (rbg + attn_cheap_dropout), batch-64 scaling, and cached per-token
# fusion at batch 64.  Takes the PID of the running chain as $1.
# Usage: bash tools/r5_chain4.sh [wait_pid] > /tmp/r5_chain4.log 2>&1 &
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

# headline: batch 32, auto policy (rbg + cheap dropout), twice for spread
run python bench.py
run python bench.py
# batch-64 scaling row
run env BENCH_BATCH=64 python bench.py
# cheap-dropout ablation at the headline batch (forces per-head bernoulli)
run env BENCH_CHEAP_DROPOUT=0 python bench.py
# cached per-token fusion at batch 64
run python tools/bench_decode.py --batch 64 --beam 8 --fst per_token

echo "### CHAIN4 DONE $(date -u)"
