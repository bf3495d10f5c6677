"""AUTO-entry-layout compilation + input staging (serving benchmark protocol).

XLA chooses entry layouts for jits compiled with
``jax.experimental.layout.Layout.AUTO``; re-staging the inputs in exactly
those formats OUTSIDE a timed region removes in-graph entry relayouts
(~1 ms/cube on the CubeNET serving graph — bench.py r5, BENCHMARKS.md).
Shared by bench.py and scripts/trace_infer.py so the benchmark and its
diagnostic trace always measure the same graph.
"""

from __future__ import annotations


def compile_with_auto_formats(jitted, *args):
    """Lower an AUTO-layout ``jax.jit`` on the args' avals and compile.

    Returns ``(compiled, formats)`` where ``formats`` is the per-argument
    tuple of compiler-chosen input formats (pytree-structured like the args).
    """
    import jax

    sds = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), args
    )
    compiled = jitted.lower(*sds).compile()
    return compiled, compiled.input_formats[0]


def stage_in_formats(args, formats):
    """device_put each arg (pytree) into its compiler-chosen format."""
    import jax

    return tuple(jax.device_put(a, f) for a, f in zip(args, formats))
