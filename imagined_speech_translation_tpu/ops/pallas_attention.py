"""Blocked online-softmax (flash) attention Pallas kernel for TPU.

Placeholder: raises NotImplementedError so the wrapper falls back to the jnp
path; replaced by the real kernel in the kernels milestone.
"""

from __future__ import annotations


def flash_attention(q, k, v, *, mask=None, scale=None):
    raise NotImplementedError("pallas flash attention kernel pending")
