"""Shared utilities: deterministic RNG, metrics/logging facade, pytree helpers."""

from .rng import RngStream, seed_everything  # noqa: F401
from .metrics import MetricLogger, NullLogger, JsonlLogger, get_logger  # noqa: F401
from .trees import (  # noqa: F401
    param_count,
    path_matches,
    tree_flatten_with_names,
    label_params_by_substring,
)
