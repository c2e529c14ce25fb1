"""Model library (flax.linen): per-region CNN+attention encoder, cross-region
fusion, from-scratch JAX BART seq2seq decoder, and the assembled EEG→text
model (reference: ``main_model/src/models/``)."""

from .layers import (  # noqa: F401
    GatedFFN,
    MultiHeadAttention,
    RegionConvAttentionEncoder,
    SqueezeExcite,
)
from .brain_encoder import BrainRegionEncoder, feature_diversity_stats  # noqa: F401
from .bart import BartDecoderModel, pseudo_encoder_sequence  # noqa: F401
from .eeg_model import EEGDecodingModel  # noqa: F401
from .hf_convert import convert_hf_bart_state_dict  # noqa: F401
