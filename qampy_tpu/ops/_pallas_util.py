"""Shared Pallas plumbing helpers."""
from __future__ import annotations

import jax

__all__ = ["sds"]


def sds(shape, dtype, ref):
    """ShapeDtypeStruct matching ref's shard_map varying-axes type.

    Inside jax.shard_map (check_vma=True), pallas_call outputs must declare
    how they vary across mesh axes; everything here derives from the input
    signal, so they vary exactly like it. (The one in-repo shard_map call
    currently sets check_vma=False because jax 0.9 cannot check vma through
    the Pallas interpreter; this helper keeps the declaration correct for
    when it can.)
    """
    vma = getattr(jax.typeof(ref), "vma", None)
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)
