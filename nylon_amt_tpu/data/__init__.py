"""Data: corpus assembly and window sampling."""

from nylon_amt_tpu.data.corpus import assemble_split, build_corpus_split
from nylon_amt_tpu.data.windows import WindowDataset

__all__ = ["assemble_split", "build_corpus_split", "WindowDataset"]
