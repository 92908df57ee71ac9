"""Pytree module base for kernels, means, and models.

This replaces the reference's CRTP + SFINAE machinery
(/root/reference/include/albatross/src/covariance_functions/covariance_function.hpp:63-217,
 core/parameter_handling_mixin.hpp) with a small, explicit convention:

* A ``Module`` is an immutable object automatically registered as a JAX
  pytree.  Attributes holding ``Parameter``s, child ``Module``s, (tuples
  thereof) or arrays are *dynamic* leaves; everything else is static
  metadata that keys jit specialization.
* ``get_params()`` joins the module's own ``Parameter`` attributes (keyed by
  attribute name) with its children's, earlier-wins on duplicates —
  mirroring the reference's ``map_join`` composition semantics.
* All setters are functional: they return a new module.

Because parameter values are pytree leaves, a whole kernel/model can be
passed straight through ``jax.jit`` / ``jax.grad`` — gradients of an NLML
with respect to *the kernel object itself* just work.
"""

from __future__ import annotations

import copy
from typing import Any, Dict, Tuple

import jax
import numpy as np

from .parameters import Parameter, ParameterHandlingMixin, map_join


def _is_dynamic(value: Any) -> bool:
    if isinstance(value, (Parameter, Module, jax.Array, np.ndarray)):
        return True
    if isinstance(value, tuple) and len(value) > 0:
        return all(_is_dynamic(v) for v in value)
    return False


class Module(ParameterHandlingMixin):
    """Immutable pytree with automatic parameter discovery."""

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        jax.tree_util.register_pytree_node_class(cls)

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        dyn_keys, dyn_vals, static_items = [], [], []
        for key in sorted(self.__dict__):
            if key == "_insights":  # side-channel metadata, not model state
                continue
            value = self.__dict__[key]
            if _is_dynamic(value):
                dyn_keys.append(key)
                dyn_vals.append(value)
            else:
                static_items.append((key, value))
        return tuple(dyn_vals), (tuple(dyn_keys), tuple(static_items))

    # -- insights (reference model.hpp:18,166: map<string,string>) ----------
    @property
    def insights(self) -> Dict[str, str]:
        """Mutable string-map for run metadata; excluded from the pytree so
        it never affects jit keys or gradients."""
        if "_insights" not in self.__dict__:
            object.__setattr__(self, "_insights", {})
        return self.__dict__["_insights"]

    @classmethod
    def tree_unflatten(cls, aux, children):
        dyn_keys, static_items = aux
        obj = cls.__new__(cls)
        for key, value in static_items:
            object.__setattr__(obj, key, value)
        for key, value in zip(dyn_keys, children):
            object.__setattr__(obj, key, value)
        return obj

    # -- functional replace -------------------------------------------------
    def _replace(self, **updates) -> "Module":
        obj = copy.copy(self)
        for key, value in updates.items():
            if key not in self.__dict__:
                raise AttributeError(f"{type(self).__name__} has no field {key}")
            object.__setattr__(obj, key, value)
        return obj

    # -- parameter protocol -------------------------------------------------
    def _own_params(self) -> Dict[str, Parameter]:
        return {
            k: v for k, v in self.__dict__.items() if isinstance(v, Parameter)
        }

    def _child_modules(self) -> Tuple[Tuple[str, "Module"], ...]:
        out = []
        for key in sorted(self.__dict__):
            v = self.__dict__[key]
            if isinstance(v, Module):
                out.append((key, v))
            elif isinstance(v, tuple):
                for i, e in enumerate(v):
                    if isinstance(e, Module):
                        out.append((f"{key}[{i}]", e))
        return tuple(out)

    def get_params(self):
        stores = [self._own_params()]
        for _, child in self._child_modules():
            stores.append(child.get_params())
        return map_join(*stores)

    def _replace_param(self, name: str, param: Parameter) -> "Module":
        if name in self._own_params():
            return self._replace(**{name: param})
        for key, child in self._child_modules():
            if name in child.get_params():
                new_child = child._replace_param(name, param)
                if "[" in key:  # tuple element
                    base, idx = key[:-1].split("[")
                    tup = list(self.__dict__[base])
                    tup[int(idx)] = new_child
                    return self._replace(**{base: tuple(tup)})
                return self._replace(**{key: new_child})
        raise KeyError(f"parameter `{name}` not found in {type(self).__name__}")

    # -- misc ---------------------------------------------------------------
    @property
    def name(self) -> str:
        return type(self).__name__.lower()

    def __repr__(self):
        params = ", ".join(
            f"{k}={float(v.value):g}"
            for k, v in sorted(self._own_params().items())
            if np.ndim(v.value) == 0 and not isinstance(v.value, jax.core.Tracer)
        )
        return f"{type(self).__name__}({params})"
