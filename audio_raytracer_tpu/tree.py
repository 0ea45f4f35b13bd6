"""Pytree dataclass helper.

A thin wrapper over ``jax.tree_util.register_dataclass`` so scene / result
containers are plain frozen dataclasses that JAX transforms (jit, vmap,
grad, shard_map) traverse natively. This replaces the reference's C#
POD-struct tier (DataTypes/Collider Structs/*.cs) with functional pytrees.
"""

from __future__ import annotations

import dataclasses
from typing import TypeVar

import jax

_T = TypeVar("_T")


def pytree_dataclass(cls: type[_T]) -> type[_T]:
    """Decorate a class as a frozen dataclass registered as a JAX pytree.

    Fields whose ``metadata`` contains ``{"static": True}`` are treated as
    auxiliary (hashable, trace-time) data; everything else is a child leaf.
    """
    cls = dataclasses.dataclass(frozen=True)(cls)
    data_fields = []
    meta_fields = []
    for f in dataclasses.fields(cls):
        if f.metadata.get("static", False):
            meta_fields.append(f.name)
        else:
            data_fields.append(f.name)
    jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=meta_fields
    )
    return cls


def static_field(**kwargs):
    """A dataclass field treated as static (aux) data by JAX."""
    metadata = dict(kwargs.pop("metadata", {}))
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)
