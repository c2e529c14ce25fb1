"""TPU scale-out layer: device mesh, sharding rules, pjit train step.

The reference is single-GPU with no distributed machinery (SURVEY.md §2.6);
this layer is the TPU-native design: a ``(data, model)`` mesh over ICI,
batch sharded over ``data`` (gradient all-reduce emerges from the global-mean
semantics under jit), optional tensor parallelism of the BART FFN/attention
over ``model``, XLA inserting the collectives."""

from .context import (  # noqa: F401
    context_mesh,
    get_context_mesh,
    ring_attention,
)
from .distributed import (  # noqa: F401
    initialize_distributed,
    is_primary,
    sync_hosts,
)
from .mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicate,
    shard_train_state,
    state_sharding_tree,
)
