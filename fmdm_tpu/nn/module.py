"""
Minimal functional module system for JAX.

Design: a ``Module`` is a *builder* object. Constructing it wires up the
architecture (children + parameter initializers); it owns no arrays. Parameters
live in a plain nested-dict pytree produced by ``module.init(key)`` and are
passed explicitly to ``module(params, *args)``, which is pure and jit/scan/pjit
friendly.

The nested-dict key paths intentionally mirror PyTorch ``state_dict`` naming of
the reference implementation (e.g. ``down_blocks.0.resnets.1.conv1.conv.weight``,
see /root/reference/src/models/unet/unet_diffusers_nd.py:62-146) so that torch
checkpoints convert to/from our trees by a mechanical flatten/transpose — no
renaming tables needed for our own models.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


class Module:
    """Base class for functional modules (see module docstring)."""

    def __init__(self) -> None:
        object.__setattr__(self, "_children", {})
        object.__setattr__(self, "_param_inits", {})

    # -- construction ------------------------------------------------------
    def __setattr__(self, name: str, value: Any) -> None:
        if isinstance(value, Module):
            self._children[name] = value
        object.__setattr__(self, name, value)

    def param(self, name: str, init_fn: Callable[[jax.Array], jax.Array]) -> None:
        """Register a parameter initializer under ``name``."""
        self._param_inits[name] = init_fn

    def add_child(self, name: str, module: "Module") -> "Module":
        self._children[name] = module
        object.__setattr__(self, name.replace(".", "_"), module)
        return module

    # -- initialization ----------------------------------------------------
    def init(self, key: jax.Array) -> Params:
        """Create the parameter pytree for this module (and its children)."""
        names = list(self._param_inits.keys()) + list(self._children.keys())
        out: Params = {}
        if not names:
            return out
        keys = jax.random.split(key, len(names))
        for k, name in zip(keys, names):
            if name in self._param_inits:
                out[name] = self._param_inits[name](k)
            else:
                sub = self._children[name].init(k)
                # Skip empty subtrees (Identity, activations): they would not
                # survive a flatten/unflatten round-trip (checkpoints) and
                # would make saved/live pytree structures diverge.
                if sub:
                    out[name] = sub
        return out

    # -- application -------------------------------------------------------
    def __call__(self, params: Params, *args, **kwargs):
        raise NotImplementedError

    # -- utilities ---------------------------------------------------------
    def children(self) -> Dict[str, "Module"]:
        return dict(self._children)


class ModuleList(Module):
    """Ordered container; children named "0", "1", ... like torch ModuleList."""

    def __init__(self, modules: Optional[List[Module]] = None):
        super().__init__()
        self._items: List[Module] = []
        for m in modules or []:
            self.append(m)

    def append(self, module: Module) -> None:
        self.add_child(str(len(self._items)), module)
        self._items.append(module)

    def __iter__(self) -> Iterator[Module]:
        return iter(self._items)

    def __len__(self) -> int:
        return len(self._items)

    def __getitem__(self, idx: int) -> Module:
        return self._items[idx]


class Identity(Module):
    def __call__(self, params: Params, x, **kwargs):
        return x


# ---------------------------------------------------------------------------
# Pytree <-> flat state-dict helpers
# ---------------------------------------------------------------------------

def flatten_params(params: Params, prefix: str = "") -> Dict[str, jax.Array]:
    """Flatten a nested param dict into torch-style dotted names -> arrays."""
    flat: Dict[str, jax.Array] = {}
    for name, value in params.items():
        full = f"{prefix}.{name}" if prefix else name
        if isinstance(value, dict):
            flat.update(flatten_params(value, full))
        else:
            flat[full] = value
    return flat


def unflatten_params(flat: Dict[str, Any]) -> Params:
    """Inverse of :func:`flatten_params`."""
    out: Params = {}
    for name, value in flat.items():
        parts = name.split(".")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return out


def param_count(params: Params) -> int:
    leaves = jax.tree_util.tree_leaves(params)
    return int(sum(np.prod(l.shape) for l in leaves))


def cast_floating(params: Params, dtype) -> Params:
    """Cast floating-point leaves of a pytree to ``dtype`` (ints untouched).

    QuantizedConv/LinearWeight bundles (ops/quant.py) pass through unchanged:
    their payload is int8 and their dequant scales must stay f32 for accuracy.
    """
    from fmdm_tpu.ops.quant import QuantizedConvWeight, QuantizedLinearWeight

    kinds = (QuantizedConvWeight, QuantizedLinearWeight)

    def _cast(x):
        if isinstance(x, kinds):
            return x
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(
        _cast, params, is_leaf=lambda x: isinstance(x, kinds)
    )
