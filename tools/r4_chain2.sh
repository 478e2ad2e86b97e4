#!/bin/bash
# Round-4 session chain v2: wait for the in-flight bench_cli_train
# (save_interval 1), then the amortized variant, then the fixed
# chip-window measurement suite, then the 3-seed grammar matrix.
cd /root/repo
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/repo:$PYTHONPATH
log=/tmp/cli_amortize.log

while [ -e /proc/3314 ]; do sleep 10; done

run () {
    echo "### $* — $(date -u)" | tee -a $log
    timeout 1200 "$@" >> $log 2>&1
    echo "### exit $? $(date -u)" | tee -a $log
}
run python tools/bench_cli_train.py --epochs 3 --save_interval 3
echo "CLI AMORTIZE DONE $(date -u)" | tee -a $log

bash tools/chip_window_r4.sh /tmp/chip_window.log

bash tools/run_grammar_seeds.sh /tmp/pika_grammar > /tmp/grammar_seeds.log 2>&1
