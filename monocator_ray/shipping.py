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
