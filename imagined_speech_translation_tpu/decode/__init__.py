"""XLA-compiled autoregressive decoding: greedy and beam search with HF
``generate`` semantics (the reference decodes via HF beam-3,
``main_model/src/models/bart_decoder.py:59-78``)."""

from .search import DecodeParams, beam_search, greedy_search  # noqa: F401
from .generate import build_generate_fn  # noqa: F401
