"""Evaluation corpora: quantizers, binary layout IO, synthetic profiles."""

from .corpus import (  # noqa: F401
    CORPUS_PROFILES,
    load_dataset,
    quantize,
    read_dat,
    synthetic_corpus,
    write_dat,
)
