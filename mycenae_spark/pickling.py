"""One home for the ship-by-value convention.

Executor Python workers unpickle our kernels (stateful streaming
functions, the bus source's readers, the multimodal Arrow kernels)
WITHOUT the repo on their ``sys.path`` — the driver patching its own
path does not propagate — so the defining module must be registered for
by-value cloudpickle serialization.

NOTE the effect is PROCESS-GLOBAL: once registered, every closure
pickled in the session that references that module embeds it by value.
That is exactly what the kernels need and harmless for these small,
dependency-light modules, but it is a session-wide switch, not a
per-call one — so each module registers at most ONCE (r8 ADVICE:
repeated per-call registration added nothing), guarded here in one
place instead of per-module copies of the same boilerplate (r9 review).
"""

from __future__ import annotations

from types import ModuleType

_REGISTERED: set[str] = set()


def register_module_by_value(module: ModuleType) -> None:
    """Idempotently register ``module`` for by-value pickling."""
    if module.__name__ in _REGISTERED:
        return
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(module)
    _REGISTERED.add(module.__name__)
