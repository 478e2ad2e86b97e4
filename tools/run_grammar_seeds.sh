#!/bin/bash
# Round-4 driver: run egs/mini_grammar.sh for SEED=1..3 serially on the
# one real chip, logging per-seed.  Stages 0-2 (corpus+LM) are shared.
cd /root/repo
work=${1:-/tmp/pika_grammar}
for s in 1 2 3; do
    echo "===== SEED $s start $(date) ====="
    SEED=$s timeout 7200 bash egs/mini_grammar.sh $work 2>&1 | tail -40
    echo "===== SEED $s done $(date) ====="
done
echo "ALL SEEDS DONE $(date)"
