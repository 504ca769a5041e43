"""Dataclass-as-pytree helper.

`pytree_dataclass` registers a frozen dataclass with JAX, splitting fields
into array leaves (traced) and static fields (hashed into the treedef).
Static fields are declared with `static_field()`.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax


def static_field(**kwargs) -> Any:
    """Marks a dataclass field as static (part of the pytree treedef)."""
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def pytree_dataclass(cls):
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = dataclasses.fields(cls)
    data_names = tuple(f.name for f in fields if not f.metadata.get("static"))
    static_names = tuple(f.name for f in fields if f.metadata.get("static"))

    def flatten(obj):
        data = tuple(getattr(obj, n) for n in data_names)
        static = tuple(getattr(obj, n) for n in static_names)
        return data, static

    def flatten_with_keys(obj):
        data = tuple(
            (jax.tree_util.GetAttrKey(n), getattr(obj, n)) for n in data_names
        )
        static = tuple(getattr(obj, n) for n in static_names)
        return data, static

    def unflatten(static, data):
        kwargs = dict(zip(data_names, data))
        kwargs.update(zip(static_names, static))
        return cls(**kwargs)

    jax.tree_util.register_pytree_with_keys(
        cls, flatten_with_keys, unflatten, flatten
    )

    def replace(self, **updates):
        return dataclasses.replace(self, **updates)

    cls.replace = replace
    return cls
