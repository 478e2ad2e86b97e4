"""Decoding: jitted greedy and batched beam search, n-gram FST shallow
fusion, LAS rescoring, N-best fusion, and WER scoring."""

from pika_tpu.decode.greedy import greedy_decode, greedy_decode_waveforms
from pika_tpu.decode.wer import edit_distance, edit_distance_batch, score_wer
from pika_tpu.decode.beam import BeamConfig, beam_search, beam_search_features, beam_search_waveforms
from pika_tpu.decode.fst import FstTables, compile_arpa, read_text_fst, init_state_sets
from pika_tpu.decode.rescore import las_score_hyps, rerank_nbest
