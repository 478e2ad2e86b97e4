# Environment for pika_tpu recipes — no Kaldi, no CUDA paths needed.
export PYTHONPATH=$(dirname $(dirname $(readlink -f $0))):$PYTHONPATH
