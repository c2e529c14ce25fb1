"""Host data plane: Chisco pickle corpus, region mapping, robust
normalization, tokenization, batching and device feed.

Reference: ``main_model/src/data/`` (dataset.py, utils.py) — re-designed
around fixed-shape stacked region tensors ``(region=4, channel=16, time)``
with channel masks so one XLA program covers the ragged 16/9/11/12-channel
regions (SURVEY.md §7 hard part 6).
"""

from .regions import (  # noqa: F401
    ELECTRODE_REGIONS,
    REGION_NAMES,
    RegionSpec,
    build_region_indices,
    get_electrode_regions,
    load_montage,
)
from .scaler import RegionRobustScaler  # noqa: F401
from .tokenizer import ChineseCharTokenizer, WordPieceTokenizer  # noqa: F401
from .chisco import ChiscoCorpus, validate_sample  # noqa: F401
from .dataset import EEGTextDataset, split_indices  # noqa: F401
from .feed import batch_iterator, device_prefetch  # noqa: F401
from .synthetic import make_synthetic_corpus, make_synthetic_montage  # noqa: F401
