"""Wake-event detector: native C++ library bindings + JAX twin
(reference: ``wake_model/`` — an on-device detector that gates when the
expensive decoder runs, paper ¶170-171)."""

from .native import NativeWakeModel, build_native_library, find_native_library  # noqa: F401
from .jax_twin import WakeMLP, make_wake_train_step  # noqa: F401
