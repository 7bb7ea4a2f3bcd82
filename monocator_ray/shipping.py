"""Worker-import safety net.

The graft driver (and any host app) calls ``ray.init`` *before* importing this
package, so Ray workers may not have ``/root/repo`` on ``sys.path`` — stage
functions pickled by reference would then fail to unpickle on workers.  Fix:
register every ``monocator_ray`` module with Ray's cloudpickle for
pickle-by-value shipping.  Idempotent and cheap; every public pipeline entry
point calls :func:`ensure_shipped` before building a Dataset.
"""

from __future__ import annotations

import sys

_done: set[str] = set()


def ensure_shipped() -> None:
    try:
        from ray import cloudpickle as rcp
    except ImportError:  # ray absent: nothing to ship
        return
    for name, mod in list(sys.modules.items()):
        if name.startswith("monocator_ray") and name not in _done and mod is not None:
            try:
                rcp.register_pickle_by_value(mod)
                _done.add(name)
            except Exception:
                pass
    _tune_shuffle_reservation()


def _tune_shuffle_reservation() -> None:
    """Cap hash-shuffle aggregator CPU reservation.

    Ray Data's hash shuffle (groupby / join) reserves up to 50% of cluster
    CPUs per shuffle OPERATOR for its aggregator actor pool.  A pipeline with
    several pipelined shuffle stages (banding groupby -> pair groupby ->
    text joins -> sort, as in the near-dup queries) spins up every stage's
    pool at once; on a small session the pools plus the map actor pools
    reserve every CPU and the map TASKS that feed them starve — observed as
    a full deadlock at num_cpus=4.  Aggregators are mostly-idle reducers, so
    a small fixed reservation per partition is safe at every scale and keeps
    multi-shuffle pipelines schedulable."""
    try:
        from ray.data import DataContext

        ctx = DataContext.get_current()
        ctx.join_operator_actor_num_cpus_per_partition_override = 0.1
        ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.1
        ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.1
    except Exception:
        pass
