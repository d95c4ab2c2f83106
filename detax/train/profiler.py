"""Tracing / profiling hooks (SURVEY.md §5.1).

The reference's only "tracing" story is TorchScript export-awareness
(``torch.jit.is_scripting()`` guards, e.g. ``utils.py:79-83``) intended for a
Rust server that never materialized. On TPU, ``jax.jit`` *is* the export
story; profiling is first-class:

- :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace of host + TPU timelines.
- :func:`annotate` — named region visible in the trace.
- :func:`dump_hlo` — persist the optimized HLO of a jitted function for
  offline inspection (fusion/layout audits).
- :func:`xla_dump_env` — env flags to make XLA write all HLO stages.
"""

from __future__ import annotations

import contextlib
import os
from typing import Any, Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/detax_trace") -> Iterator[None]:
    """Capture a jax.profiler trace (open with TensorBoard's profile plugin)."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region: ``with annotate("roi_align"): ...``"""
    return jax.profiler.TraceAnnotation(name)


def dump_hlo(fn, *example_args, path: Optional[str] = None, **example_kwargs) -> str:
    """Return (and optionally write) the optimized HLO text of ``jit(fn)``."""
    lowered = jax.jit(fn).lower(*example_args, **example_kwargs)
    compiled = lowered.compile()
    text = compiled.as_text()
    if path:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "w") as f:
            f.write(text)
    return text


def compile_stats(fn, *example_args, **example_kwargs) -> Dict[str, Any]:
    """FLOP/memory estimates from the compiled executable — the quantitative
    version of the reference's shape-assert bookkeeping (SURVEY.md §4)."""
    compiled = jax.jit(fn).lower(*example_args, **example_kwargs).compile()
    try:
        cost = compiled.cost_analysis()
        mem = compiled.memory_analysis()
    except Exception:
        cost, mem = {}, None
    out = {"flops": cost.get("flops") if isinstance(cost, dict) else None}
    if mem is not None:
        out["temp_size_bytes"] = getattr(mem, "temp_size_in_bytes", None)
        out["argument_size_bytes"] = getattr(mem, "argument_size_in_bytes", None)
        out["output_size_bytes"] = getattr(mem, "output_size_in_bytes", None)
    return out


def xla_dump_env(dump_dir: str = "/tmp/detax_xla_dump") -> Dict[str, str]:
    """Env vars that make XLA dump every HLO stage (set before jax init)."""
    return {"XLA_FLAGS": f"--xla_dump_to={dump_dir} --xla_dump_hlo_as_text"}
