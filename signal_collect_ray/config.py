"""Engine configuration.

Mirrors the knobs of the reference's ``ExecutionConfiguration.scala``
(signalThreshold default 0.01, collectThreshold 0.0, steps/time limits —
lines 31, 46-52, 86-97) plus the Ray-Data-specific physical knobs
(partition count, actor-pool sizing, checkpoint cadence).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def _default_parallelism() -> int:
    try:
        import ray

        if ray.is_initialized():
            return max(1, int(ray.available_resources().get("CPU", 4)))
    except Exception:
        pass
    return max(1, (os.cpu_count() or 4) // 2)


@dataclass
class EngineConfig:
    # Number of graph partitions (hash(vid) % P for vertices AND edge
    # sources AND the signal shuffle key). On a real cluster: ~2-4x total
    # cores. Kept moderate by default so per-superstep task overhead is
    # amortized at test scale.
    num_partitions: int = 8

    # Score-guided scheduling: a vertex signals only when its residual
    # (algorithm-defined scoreSignal) exceeds this. Reference default is
    # 0.01 (ExecutionConfiguration.scala:31); we default to 0.0 so tests
    # converge to the exact fixed point, and callers relax it for speed.
    signal_threshold: float = 0.0

    # Convergence: stop when max residual over all vertices <= eps AND the
    # active frontier is empty (WorkerImplementation.scala:293-297
    # "toSignal.isEmpty" semantics).
    eps: float = 1e-6

    # Bounds (withStepsLimit / withTimeLimit, ExecutionConfiguration.scala:86-97).
    max_supersteps: int = 500
    time_limit_s: float | None = None

    # Resident-executor sync batching: the driver submits this many
    # superstep rounds before fetching metrics (worker rounds chain
    # through object-ref dependencies, actor-to-actor). 1 (default) =
    # check convergence after every superstep, exact round-1 behavior;
    # > 1 amortizes the driver barrier over short supersteps at the cost
    # of up to interval-1 overshoot rounds past an eps fixpoint
    # (fixed-k runs are unaffected). Checkpoint / global-termination
    # cadences force syncs at their own multiples regardless.
    convergence_check_interval: int = 1

    # Checkpointing: every superstep by default (the north rule requires
    # per-superstep resumable checkpoints). Raise to trade durability for
    # speed on long runs.
    checkpoint_interval: int = 1

    # Keep only the newest N COMPLETE checkpoints (None = keep all).
    # Resume only ever reads the latest complete step, so retain=2
    # (resume point + one predecessor) is safe; at 10^12 vertices a
    # 100-superstep run cannot afford 100 full state copies. Pruning
    # happens strictly after the newer manifest lands (crash-safe).
    checkpoint_retain: Optional[int] = None

    # Signal-stage compute strategy. "tasks" (default) runs the signal
    # stage as stateless tasks — lowest per-superstep latency, CSR blocks
    # still come zero-copy from the object store. "actors" runs it as a
    # map_batches actor pool (CSR object-store handles cached per actor)
    # — better when a superstep has many blocks per partition.
    signal_mode: str = "tasks"
    # Actor pool size when signal_mode="actors" (None → autoscale).
    signal_concurrency: int | tuple[int, int] | None = None

    # Undeliverable-signal handler (reference Handlers.scala:26-64 /
    # DefaultHandlerFactory): "drop" (count in manifests — our default),
    # "raise" (reference default: throw), or "create" (auto-create the
    # missing vertex via algo.init with no out-edges and deliver —
    # NonExistentVertexHandlerSpec behavior). "raise"/"create" are
    # honored by the durable SuperstepEngine; the resident executor's
    # dense path requires a closed vertex set and supports "drop" only.
    on_undeliverable: str = "drop"

    # Resident-executor dense-path pool sizing (AUTO mode only — an
    # explicit ResidentEngine(num_workers=...) is honored up to CPUs and
    # partitions). Per-step cost ≈ α·W (exchange objects + barrier
    # straggler tail) + E/(W·σ) (scatter compute), so the auto optimum
    # scales as sqrt(E)/C where C folds the measured α/σ ratio of the
    # host. 250 is the single-node measurement (engine_resident.py); on
    # a cluster with different interconnect α, tune it here or via the
    # SCRAY_DENSE_WORKER_COST env var. The engine logs whenever this cap
    # (not CPUs/partitions) is what bounds the pool.
    dense_worker_cost: float = field(
        default_factory=lambda: float(os.environ.get("SCRAY_DENSE_WORKER_COST", "250"))
    )

    # Salted two-stage signal aggregation (hub-skew handling, north
    # rule): when > 1, signal rows are pre-combined per
    # (dst_part, hash(dst) % salt_buckets) bucket before the final
    # groupby(dst_part) — the largest collect group is then bounded by
    # the partition's distinct-dst count (≤ V/P) regardless of how many
    # signal blocks fed it. Worth turning on when blocks-per-superstep is
    # large (web-scale inputs); off by default because the extra exchange
    # costs more than it saves at test scale.
    salt_buckets: int = 1

    # AUTO-salting (durable engine): when True, the per-partition
    # ``signal_rows_in`` census of each superstep manifest is watched,
    # and the first time the hottest partition exceeds
    # ``auto_salt_skew`` × the median, salted two-stage aggregation
    # (``auto_salt_buckets``) switches on for every subsequent
    # superstep — the decision is recorded in that step's manifest
    # (``auto_salt`` key, resume-safe) so a restarted run stays salted.
    # The skew signal is free: the census already rides the collect
    # metrics rows. Static ``salt_buckets`` > 1 takes precedence.
    auto_salt: bool = False
    auto_salt_skew: float = 4.0
    auto_salt_buckets: int = 8

    # Resident-executor fault tolerance: when a worker actor dies
    # mid-run (node loss, OOM kill), ResidentEngine.run rebuilds the
    # pool and resumes from the latest complete per-superstep checkpoint
    # up to this many times before surfacing the error. 0 disables
    # recovery (fail fast). The step-0 checkpoint written at start
    # guarantees a resume point always exists.
    max_worker_restarts: int = 2

    # Where runs live unless an explicit run_dir is passed.
    checkpoint_root: str = "/tmp/scray_runs"

    # Pool sizing hint; resolved lazily against the live Ray session.
    parallelism: int = field(default_factory=_default_parallelism)

    def resolved_signal_concurrency(self):
        if self.signal_concurrency is not None:
            return self.signal_concurrency
        n = min(self.num_partitions, _default_parallelism())
        return (1, max(1, n))
