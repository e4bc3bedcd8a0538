"""Serving & export: AOT compilation and portable serialization of the
inference forward.

The reference has no serving layer at all — its deployment story is "run
`demo_image.py` in a Python+torch environment with the repo on PYTHONPATH"
(reference demo_image.py:20-42; SURVEY.md §1: "no serving layer"). For a
production TPU deployment we want two stronger artifacts:

1. **AOT-compiled executable** (`aot_compile`): `jax.jit(fn).lower(...)
   .compile()` ahead of time, so a serving process pays zero tracing /
   compilation at request time and the persistent compile cache can be
   pre-warmed offline.
2. **Serialized StableHLO artifact** (`export_forward` / `save_exported` /
   `load_exported`): `jax.export` bytes that bundle the lowered computation
   with its input/output tree and shapes. The artifact is loadable in a
   process that does not import this package's model code at all (it still
   needs the weights passed in, exactly like the traced function), which
   decouples the serving fleet from the research repo.

Inference config matches the reference protocol: test-mode forward,
``iters`` GRU iterations (12 in the eval protocol, reference
evaluate.py:350; demo forward reference demo.py:15-19), inputs
(B, H, W, 3) in [0, 255].

Portability notes:

- An export is bound to the lowering platform(s). The default exports for
  the current backend; pass ``platforms=("tpu", "cpu")`` for a
  multi-platform artifact — that requires the pure-XLA lookup
  (``lookup_mode='mxu'``), since the Pallas kernel lowers to a
  TPU-specific custom call.
- Shapes are static: one artifact per (batch, H, W, iters). Export
  several, or use ``jax.export.symbolic_shape`` upstream if a dynamic
  batch is ever needed (not done here — serving batches are fixed).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def make_forward(model, iters: int = 12):
    """The pure inference function ``fn(variables, image1, image2) ->
    flow`` for ``model`` — the unit every serving path (jit, AOT, export)
    compiles. Test-mode: returns only the final upsampled branch-A flow
    (reference core/prior_raft.py:212-213)."""

    def fn(variables, image1, image2):
        return model.apply(variables, image1, image2, iters=iters,
                           test_mode=True)

    return fn


def _example_batch(input_shape: Sequence[int]):
    b, h, w = input_shape
    img = jnp.zeros((b, h, w, 3), jnp.float32)
    return img, img


def aot_compile(model, variables, input_shape: Sequence[int],
                iters: int = 12):
    """Ahead-of-time compile the inference forward for ``input_shape`` =
    (batch, H, W).

    Returns the compiled executable: call it as
    ``compiled(variables, image1, image2)``. Raises at call time if the
    argument shapes/dtypes differ from the compiled signature — that is
    the point (a serving process must never silently retrace)."""
    fn = jax.jit(make_forward(model, iters))
    img1, img2 = _example_batch(input_shape)
    return fn.lower(variables, img1, img2).compile()


def export_forward(model, variables, input_shape: Sequence[int],
                   iters: int = 12,
                   platforms: Optional[Sequence[str]] = None):
    """Export the inference forward as a `jax.export.Exported`.

    ``platforms``: lowering platforms for the artifact (default: current
    backend). Multi-platform artifacts need ``lookup_mode='mxu'`` on the
    model (pure XLA — no TPU-specific custom calls).
    """
    from jax import export as jex

    fn = jax.jit(make_forward(model, iters))
    img1, img2 = _example_batch(input_shape)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    exported = jex.export(fn, **kwargs)(variables, img1, img2)
    return exported


def save_exported(exported, path: str) -> None:
    """Serialize an `Exported` to ``path`` (StableHLO + calling
    convention, self-contained bytes)."""
    data = exported.serialize()
    with open(path, "wb") as f:
        f.write(bytes(data))


def load_exported(path: str):
    """Load a serialized artifact; returns a callable
    ``fn(variables, image1, image2) -> flow`` that executes the exported
    computation (jittable, differentiable-if-exported-with-vjp=False
    here: inference only)."""
    from jax import export as jex

    with open(path, "rb") as f:
        data = f.read()
    exported = jex.deserialize(bytearray(data))

    def fn(variables, image1, image2):
        return exported.call(variables, image1, image2)

    fn.exported = exported  # introspection: in_avals, platforms, ...
    return fn


def exported_summary(exported) -> dict:
    """Human/JSON-facing description of an artifact (used by the CLI)."""
    return {
        "platforms": list(exported.platforms),
        "in_avals": [str(a) for a in jax.tree_util.tree_leaves(
            exported.in_avals)][-2:],  # the two image avals (weights elided)
        "out_avals": [str(a) for a in jax.tree_util.tree_leaves(
            exported.out_avals)],
        "num_weight_leaves": len(jax.tree_util.tree_leaves(
            exported.in_avals)) - 2,
    }
