"""Minimal module tree without autograd.

Counterpart of the reference's ``tensorrt_llm/module.py:8-164`` (Module /
ModuleList / register_network_output), with one TPU-native addition: a
functional ``apply(params, ...)`` entry point so a module forward can be
traced under ``jax.jit``/``pjit`` with the weights passed as a pytree
argument (donatable, shardable) instead of baked-in constants.

The reference builds a TRT graph by calling forward once; we do exactly the
same thing except the trace is a jaxpr and the "engine" is the XLA
executable cached by jit.
"""
from __future__ import annotations

from collections import OrderedDict
from typing import Any, Dict, Iterator, Optional, Tuple

import jax

from .parameter import Parameter


class Module:

    def __init__(self):
        object.__setattr__(self, "_modules", OrderedDict())
        object.__setattr__(self, "_parameters", OrderedDict())
        object.__setattr__(self, "_network_outputs", OrderedDict())
        object.__setattr__(self, "_collect_outputs", False)

    def __setattr__(self, name: str, value: Any) -> None:
        if isinstance(value, Module):
            self._modules[name] = value
        elif isinstance(value, Parameter):
            self._parameters[name] = value
        object.__setattr__(self, name, value)

    def register_parameter(self, name: str, param: Optional[Parameter]) -> None:
        """ref: module attribute registration; None unregisters (the reference
        stores None placeholders, e.g. attention.py:100-105)."""
        if param is None:
            self._parameters.pop(name, None)
            object.__setattr__(self, name, None)
        else:
            setattr(self, name, param)

    def forward(self, *args, **kwargs):
        raise NotImplementedError

    def __call__(self, *args, **kwargs):
        return self.forward(*args, **kwargs)

    # -- tree walking ------------------------------------------------------

    def named_modules(self, prefix: str = "") -> Iterator[Tuple[str, "Module"]]:
        yield prefix, self
        for name, mod in self._modules.items():
            sub = f"{prefix}.{name}" if prefix else name
            yield from mod.named_modules(sub)

    def named_parameters(self, prefix: str = "") -> Iterator[Tuple[str, Parameter]]:
        for mod_name, mod in self.named_modules(prefix):
            for name, param in mod._parameters.items():
                yield (f"{mod_name}.{name}" if mod_name else name), param

    def named_children(self) -> Iterator[Tuple[str, "Module"]]:
        yield from self._modules.items()

    # -- state dict / functional binding ----------------------------------

    def state_dict(self) -> Dict[str, Any]:
        """Flat {dotted_name: array} of all *initialised* parameters."""
        return OrderedDict(
            (n, p.value) for n, p in self.named_parameters() if p.is_inited)

    def load_state_dict(self, state: Dict[str, Any], strict: bool = True) -> None:
        params = dict(self.named_parameters())
        missing = [k for k in params if k not in state]
        unexpected = [k for k in state if k not in params]
        if strict and unexpected:
            raise KeyError(f"unexpected keys in state_dict: {unexpected[:8]} ...")
        if strict and missing:
            raise KeyError(f"missing keys in state_dict: {missing[:8]} ...")
        for k, v in state.items():
            if k in params:
                params[k].value = v

    def zeros_init(self) -> None:
        """Zero-fill every declared parameter (fast init for compile checks
        and benches where values don't matter)."""
        import jax.numpy as jnp
        for _, p in self.named_parameters():
            if p._shape is None:
                raise RuntimeError("parameter without declared shape")
            p._value = jnp.zeros(p._shape, p._dtype)

    def random_init(self, key, scale: float = 0.02) -> None:
        """Initialise every parameter with small random normals (bench/tests)."""
        params = list(self.named_parameters())
        keys = jax.random.split(key, max(len(params), 1))
        for (name, p), k in zip(params, keys):
            p.random_init(k, scale)

    def bind(self, state: Dict[str, Any]) -> None:
        """Bind arrays (possibly tracers) onto parameters, no coercion."""
        params = dict(self.named_parameters())
        for k, v in state.items():
            params[k]._bind(v)

    def apply(self, state: Dict[str, Any], *args, method=None, **kwargs):
        """Functional call: bind `state`, run forward, restore previous values.

        This is what makes ``jax.jit(lambda params, x: model.apply(params, x))``
        a pure function of (params, x).
        """
        params = dict(self.named_parameters())
        saved = {k: p._value for k, p in params.items()}
        try:
            self.bind(state)
            fn = method if method is not None else self.forward
            return fn(*args, **kwargs)
        finally:
            for k, p in params.items():
                p._value = saved[k]

    def pspecs(self) -> Dict[str, Any]:
        """{dotted_name: PartitionSpec} matching state_dict keys — feed to
        NamedSharding for TP placement."""
        return OrderedDict((n, p.pspec) for n, p in self.named_parameters())

    # -- debugging hooks (ref: module.py:116 register_network_output) -----

    def register_network_output(self, name: str, tensor) -> None:
        if self._collect_outputs:
            self._network_outputs[name] = tensor

    def collect_network_outputs(self, collect: bool = True) -> None:
        for _, m in self.named_modules():
            object.__setattr__(m, "_collect_outputs", collect)
            if not collect:
                m._network_outputs.clear()

    def network_outputs(self) -> Dict[str, Any]:
        out = OrderedDict()
        for prefix, m in self.named_modules():
            for name, t in m._network_outputs.items():
                out[f"{prefix}.{name}" if prefix else name] = t
        return out


class ModuleList(Module):

    def __init__(self, modules) -> None:
        super().__init__()
        for i, m in enumerate(modules):
            self._modules[str(i)] = m
            object.__setattr__(self, str(i), m)

    def __getitem__(self, idx):
        if isinstance(idx, slice):
            return list(self._modules.values())[idx]
        if idx < 0:
            idx += len(self._modules)
        return self._modules[str(idx)]

    def __len__(self) -> int:
        return len(self._modules)

    def __iter__(self):
        return iter(self._modules.values())


def stack_parameter_shapes(module: "Module", n_layer: int) -> "Module":
    """Re-declare every parameter of ``module`` with a leading [n_layer]
    axis.  The module becomes a *template* for a stack of structurally
    identical layers: its state_dict holds one [n_layer, ...] array per
    weight, and ``lax.scan`` over that pytree feeds per-layer slices to
    ``module.apply`` with zero gather/copy cost — the TPU-native replacement
    for the reference's 32 separately-traced transformer blocks."""
    from jax.sharding import PartitionSpec
    for _, p in module.named_parameters():
        if p._shape is not None:
            p._shape = (n_layer,) + p._shape
        # shift the sharding spec with the new leading layer axis (layers
        # are never sharded; without this the per-dim axis names land one
        # dim early — silently mis-sharding every stacked weight)
        if tuple(p.pspec):
            p.pspec = PartitionSpec(None, *tuple(p.pspec))
        p._value = None
    return module


def stack_params(states, axis: int = 0):
    """Stack the state dicts of N structurally-identical modules into one
    state dict with a leading layer axis — the input format for scanning a
    block over layers with ``lax.scan`` (TPU-native replacement for the
    reference's 32 separately-traced transformer blocks)."""
    import jax.numpy as jnp
    keys = list(states[0].keys())
    return OrderedDict(
        (k, jnp.stack([s[k] for s in states], axis=axis)) for k in keys)
