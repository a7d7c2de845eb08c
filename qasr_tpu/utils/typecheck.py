"""Semantic tensor typing (NeuralType analogue).

Equivalent of the reference's NeuralType system + @typecheck decorator
(core/neural_types/neural_type.py:29-223, core/classes/common.py:435-553):
declared input/output specs are validated at call (trace) time — axis
letters must agree in rank and be consistent across arguments, dtypes must
match, and element-type tags document semantics.  Works on tracers (shape
checks are static), so it runs inside jit for free.

Also provides the sanitizer hooks SURVEY.md §5 calls for: assert_finite
(nan/inf detection via jax.debug) and assert_sharding.
"""
from __future__ import annotations

import functools
import inspect
from dataclasses import dataclass
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


class ElementType:
    """Semantic tag (reference neural_types/elements.py has ~40 of these)."""

    def __repr__(self):
        return type(self).__name__


class AudioSignal(ElementType): ...
class SpectrogramType(ElementType): ...
class MelSpectrogramType(ElementType): ...
class MFCCSpectrogramType(ElementType): ...
class AcousticEncodedRepresentation(ElementType): ...
class LogprobsType(ElementType): ...
class LogitsType(ElementType): ...
class LabelsType(ElementType): ...
class LengthsType(ElementType): ...
class LossType(ElementType): ...
class PredictionsType(ElementType): ...
class EmbeddedTextType(ElementType): ...


@dataclass(frozen=True)
class TensorSpec:
    """axes: string of single-letter axis names, e.g. 'BTC'; same letter =>
    same size across all checked arguments (AxisKind matching,
    neural_types/axes.py:21-101)."""

    axes: str
    element: Optional[type] = None
    dtype: Optional[Any] = None

    def check(self, name: str, x, bindings: Dict[str, int]) -> None:
        shape = jnp.shape(x)
        if len(shape) != len(self.axes):
            raise TypeError(
                f"{name}: expected rank {len(self.axes)} ({self.axes!r}), got "
                f"shape {shape}")
        for ax, dim in zip(self.axes, shape):
            if ax == "*":
                continue
            if ax in bindings and bindings[ax] != dim:
                raise TypeError(
                    f"{name}: axis {ax!r} = {dim} conflicts with previously "
                    f"bound {ax!r} = {bindings[ax]}")
            bindings[ax] = dim
        if self.dtype is not None and hasattr(x, "dtype"):
            if jnp.dtype(x.dtype) != jnp.dtype(self.dtype):
                raise TypeError(f"{name}: expected dtype {self.dtype}, got {x.dtype}")


def typed(inputs: Dict[str, TensorSpec],
          outputs: Optional[Sequence[TensorSpec]] = None):
    """@typecheck equivalent: validate declared args (and outputs) against
    TensorSpecs; undeclared args pass through."""

    def deco(fn):
        sig = inspect.signature(fn)

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            bound = sig.bind(*args, **kwargs)
            bindings: Dict[str, int] = {}
            for name, spec in inputs.items():
                if name in bound.arguments:
                    spec.check(name, bound.arguments[name], bindings)
            result = fn(*args, **kwargs)
            if outputs:
                outs = result if isinstance(result, tuple) else (result,)
                for i, spec in enumerate(outputs):
                    if spec is not None and i < len(outs):
                        spec.check(f"output[{i}]", outs[i], bindings)
            return result

        wrapper.__input_types__ = inputs
        wrapper.__output_types__ = outputs
        return wrapper

    return deco


def assert_finite(x, name: str = "tensor") -> None:
    """In-graph nan/inf sanitizer (jax.debug-based; SURVEY.md §5)."""
    import jax.debug

    bad = jnp.logical_not(jnp.all(jnp.isfinite(x)))
    jax.debug.callback(
        lambda b: (_ for _ in ()).throw(FloatingPointError(f"{name} has nan/inf"))
        if bool(b) else None, bad)


def assert_sharding(x, expected_spec) -> None:
    """Check a committed array's PartitionSpec (post-jit placement)."""
    from jax.sharding import NamedSharding

    s = getattr(x, "sharding", None)
    if isinstance(s, NamedSharding) and tuple(s.spec) != tuple(expected_spec):
        raise AssertionError(f"sharding {s.spec} != expected {expected_spec}")
