"""Host-side data layer: WAV I/O, Kaldi-layout text parsers, mrk/seq
archives, augmentation DSP, CMVN stats, and length-grouped list tools —
all with zero Kaldi/PyKaldi dependency."""

from pika_tpu.data.wavio import read_wav, write_wav
from pika_tpu.data.scp import (
    read_wav_scp,
    iter_int_vectors,
    read_int_vectors,
    write_int_vectors,
    read_symbol_table,
    read_data_lst,
)
from pika_tpu.data.archive import (
    MrkSeqWriter,
    MrkSeqReader,
    wav_scp_to_mrk_seq,
    wav_scp_to_bytes,
)
from pika_tpu.data.cmvn import CmvnStats, offset_scale, read_kaldi_matrix, write_kaldi_matrix
from pika_tpu.data.lists import split_by_length, shuffle_by_length
