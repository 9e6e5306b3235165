"""Execution modes — the reference's ``ExecutionMode`` surface
(``configuration/ExecutionMode.scala:34-88``) mapped onto this engine's
executors:

* ``SYNCHRONOUS`` — BSP supersteps with a global barrier between signal
  and collect phases (``ExecutionMode.scala:37-49``). Runs on the
  resident executor by default (low latency); pass
  ``executor="durable"`` for the per-superstep-checkpointed Ray Data
  pipeline executor.
* ``PURE_ASYNCHRONOUS`` — no ordering guarantees; workers eagerly
  propagate, chaotic relaxation (``ExecutionMode.scala:52-60``).
* ``OPTIMIZED_ASYNCHRONOUS`` — the reference's default: one synchronized
  initial signal operation, then the async schedule
  (``ExecutionMode.scala:62-71``).
* ``CONTINUOUS_ASYNCHRONOUS`` — keeps running even when the computation
  has stalled; returns a live handle for continuous querying
  (``ExecutionMode.scala:73-78``).
* ``INTERACTIVE`` — step-wise control, the console's step / continue /
  terminate surface (``ExecutionMode.scala:80-88``).
"""

from __future__ import annotations

from enum import Enum
from typing import Optional

from signal_collect_ray.algorithm import Algorithm
from signal_collect_ray.config import EngineConfig


class ExecutionMode(str, Enum):
    SYNCHRONOUS = "synchronous"
    PURE_ASYNCHRONOUS = "pure_asynchronous"
    OPTIMIZED_ASYNCHRONOUS = "optimized_asynchronous"
    CONTINUOUS_ASYNCHRONOUS = "continuous_asynchronous"
    INTERACTIVE = "interactive"


def execute(
    graph,
    algo: Algorithm,
    mode: ExecutionMode | str = ExecutionMode.SYNCHRONOUS,
    config: Optional[EngineConfig] = None,
    executor: str = "resident",
    **kwargs,
):
    """Run ``algo`` over ``graph`` under the given execution mode — the
    ``graph.execute(ExecutionConfiguration.withExecutionMode(...))``
    entry point. Returns an ``ExecutionInformation`` for the blocking
    modes, a ``ContinuousComputation`` handle for
    CONTINUOUS_ASYNCHRONOUS, and an ``InteractiveComputation`` handle
    for INTERACTIVE. Extra ``kwargs`` pass through to the executor's
    ``run`` / ``start`` / ``interactive``.
    """
    mode = ExecutionMode(mode)
    if mode is ExecutionMode.SYNCHRONOUS:
        if executor == "durable":
            from signal_collect_ray.engine import SuperstepEngine

            return SuperstepEngine(config).run(graph, algo, **kwargs)
        from signal_collect_ray.engine_resident import ResidentEngine

        return ResidentEngine(config).run(graph, algo, **kwargs)
    if mode in (
        ExecutionMode.PURE_ASYNCHRONOUS,
        ExecutionMode.OPTIMIZED_ASYNCHRONOUS,
    ):
        from signal_collect_ray.engine_async import AsyncEngine

        async_mode = (
            "optimized" if mode is ExecutionMode.OPTIMIZED_ASYNCHRONOUS else "pure"
        )
        return AsyncEngine(config).run(graph, algo, mode=async_mode, **kwargs)
    if mode is ExecutionMode.CONTINUOUS_ASYNCHRONOUS:
        from signal_collect_ray.engine_async import AsyncEngine

        return AsyncEngine(config).start(graph, algo, **kwargs)
    if mode is ExecutionMode.INTERACTIVE:
        from signal_collect_ray.engine_resident import ResidentEngine

        return ResidentEngine(config).interactive(graph, algo, **kwargs)
    raise ValueError(f"unknown execution mode {mode!r}")
