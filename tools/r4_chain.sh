#!/bin/bash
# Round-4 session chain: after the chip-window measurement suite frees the
# chip, re-measure sustained CLI training throughput with the checkpoint
# fetch amortized (VERDICT r3 item 6), then hand the chip to the 3-seed
# grammar quality matrix (item 1) for the rest of the session.
cd /root/repo
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/repo:$PYTHONPATH
log=/tmp/cli_amortize.log

# wait for the chip-window suite (pid file written by the session)
while [ -e /proc/$(cat /tmp/chipwin.pid) ]; do sleep 15; done

run () {
    echo "### $* — $(date -u)" | tee -a $log
    timeout 1200 "$@" >> $log 2>&1
    echo "### exit $? $(date -u)" | tee -a $log
}
# item 6: per-epoch checkpoint fetch vs amortized (saves only on epoch 2)
run python tools/bench_cli_train.py --epochs 3 --save_interval 1
run python tools/bench_cli_train.py --epochs 3 --save_interval 3
echo "CLI AMORTIZE DONE $(date -u)" | tee -a $log

# item 1: the grammar matrix, serially, until the session ends
bash tools/run_grammar_seeds.sh /tmp/pika_grammar > /tmp/grammar_seeds.log 2>&1
