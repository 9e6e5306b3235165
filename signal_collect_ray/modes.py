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


class BreakCondition:
    """Per-vertex break condition — the console's BreakConditionName
    surface (reference ``console/ConsoleServer.scala:74-84,99-130``,
    checked between steps by ``BreakConditionsAggregator``,
    ``console/AggregationOperation.scala:338-420``) without the web UI:
    attach to an ``InteractiveComputation`` and stepping pauses when the
    condition fires.

    Kinds: ``state_changes`` (vs the state captured when the condition
    was added, or ``value`` if given), ``state_above`` / ``state_below``
    (numeric state vs ``value``), ``signal_score_above`` /
    ``signal_score_below`` (the vertex's residual — this engine's
    scoreSignal — vs ``value``). The reference's collect-score variants
    have no equivalent here because collectThreshold is fixed at 0.0
    (every delivered signal is collected); documented, not emulated.

    Implements the two-phase aggregation protocol
    (``aggregate_partition`` + ``reduce``), so the check is one
    worker-side scan — the vertex's partition returns its (state,
    residual), every other partition returns None.
    """

    KINDS = (
        "state_changes",
        "state_above",
        "state_below",
        "signal_score_above",
        "signal_score_below",
    )

    def __init__(self, vid: int, kind: str, value=None):
        if kind not in self.KINDS:
            raise ValueError(f"kind must be one of {self.KINDS}, got {kind!r}")
        if kind != "state_changes" and value is None:
            raise ValueError(f"{kind} needs a threshold value")
        self.vid = int(vid)
        self.kind = kind
        self.value = value

    # -- aggregation protocol (GlobalTermination-compatible) ---------------
    def aggregate_partition(self, cols):
        import numpy as np

        idx = np.flatnonzero(cols["vid"] == self.vid)
        if len(idx) == 0:
            return None
        i = int(idx[0])
        return (float(cols["state"][i]), float(cols["residual"][i]))

    def reduce(self, partials):
        for p in partials:
            if p is not None:
                return p
        raise KeyError(f"vertex {self.vid} not in the graph")

    def check(self, state_residual) -> bool:
        """True when the condition fires; returns the observed value via
        ``self.observed`` (the console reports it with the pause)."""
        state, residual = state_residual
        if self.kind == "state_changes":
            if self.value is None:  # capture on first check
                self.value = state
                fired = False
            else:
                fired = state != self.value
            self.observed = state
        elif self.kind == "state_above":
            fired = state > float(self.value)
            self.observed = state
        elif self.kind == "state_below":
            fired = state < float(self.value)
            self.observed = state
        elif self.kind == "signal_score_above":
            fired = residual > float(self.value)
            self.observed = residual
        else:  # signal_score_below
            fired = residual < float(self.value)
            self.observed = residual
        return fired
