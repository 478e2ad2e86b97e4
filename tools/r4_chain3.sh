#!/bin/bash
# Round-4 session chain v3: wait for the in-flight grammar seed driver
# (tools/run_grammar_seeds.sh) to release the chip, then run the two
# remaining chip jobs of the round in priority order:
#   1. rbg dropout-RNG measurement (bench.py BENCH_RNG=rbg + step profile)
#   2. independent-LAS rescoring experiment (egs/las_diversity.sh)
# Logs to stdout; run under Bash run_in_background with output captured.
set -u
cd /root/repo

seed_pid=${1:?usage: r4_chain3.sh SEED_DRIVER_PID}
echo "### waiting for grammar seed driver (pid $seed_pid) to exit — $(date)"
while kill -0 "$seed_pid" 2>/dev/null; do sleep 60; done
# settle: let the final python decode release the TPU
sleep 30
echo "### chip free — $(date)"

run () {
    echo "### $* — $(date)"
    timeout 3600 "$@"
    echo "### exit $? $(date)"
}

run env BENCH_RNG=rbg python bench.py
run python tools/profile_step.py --batch 32 --rng_impl rbg
run bash egs/las_diversity.sh /tmp/pika_grammar
echo "CHAIN3 DONE $(date)"
