"""TPU compute ops: attention (Pallas flash kernel + jnp reference), fused
normalization helpers, and the associative-scan IIR filter used by the signal
frontend.  Every op has a pure-jnp reference implementation used on CPU and as
the numerics oracle in tests."""

from .attention import dot_product_attention, make_causal_mask  # noqa: F401
