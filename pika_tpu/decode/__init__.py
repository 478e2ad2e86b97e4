"""Decoding: jitted greedy and batched beam search, n-gram FST shallow
fusion, LAS rescoring, N-best fusion, and WER scoring."""

from pika_tpu.decode.greedy import greedy_decode, greedy_decode_waveforms
from pika_tpu.decode.wer import edit_distance, edit_distance_batch, score_wer
