#!/bin/bash
# Round-5 serial chip-work chain.  Takes the PID of the currently-running
# job to wait for as $1 (no hardcoded PIDs — ADVICE r4).
# Usage: bash tools/r5_chip_chain.sh [wait_pid] > /tmp/r5_chain.log 2>&1 &
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

# 1. seed-3 LAS diversity (train fw/bw + dev sweep + test rows)
run env SEED=3 bash egs/las_diversity.sh /tmp/pika_grammar

# 2. seed-2 independent scale re-tune (VERDICT r4 item 5)
run env SEED=2 bash tools/retune_grammar_seed.sh /tmp/pika_grammar

# 3. fusion decode bench: cache vs walk, per_beam, off (VERDICT item 2)
run python tools/bench_decode.py --batch 32 --beam 8 --fst per_token
run python tools/bench_decode.py --batch 32 --beam 8 --fst per_token --fst_cache_mb 0
run python tools/bench_decode.py --batch 32 --beam 8 --fst per_beam
run python tools/bench_decode.py --batch 32 --beam 8 --fst off

# 4. train-step residual itemization (VERDICT item 3)
run python tools/profile_step.py --batch 32 --rng_impl rbg
run python tools/profile_step.py --batch 32 --rng_impl rbg --cheap_dropout

echo "### CHAIN DONE $(date -u)"
