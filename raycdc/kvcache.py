"""Cross-process shared KV cache: a NAMED Ray actor standing in for the
reference's Redis-backed ``CacheDict`` (``indexer/cache/cache_dict.py:7-63``
in /root/reference: one process populates, every process reads).

Ray-native analog: a named actor (``get_if_exists=True``) is the cluster's
shared mutable map — any driver or worker that asks for the same name gets
the same actor, and values round-trip through the object store. The
highest-value use here is PINNING BROADCAST OBJECTS: ``put``/``putnx`` a
``ray.ObjectRef`` and the actor holding it keeps the object alive, so N
independent drivers/queries ``ray.get`` ONE zero-copy object-store copy of
a dimension table instead of each re-reading and re-``ray.put``-ing it
(:func:`raycdc.queries.common.cached_dim`).

Deliberately NOT used by the engine commit path: the lake is single-writer
by lock and all engine state rebuilds from the manifest — a shared mutable
map there would be a correctness liability, exactly why VERDICT r3 called
the Redis analog "mostly moot" for the core. It earns its keep on the
query surface (shared read-only broadcasts) and as the extension point a
TokenFetcher-style enrichment stage would memo into.
"""

from __future__ import annotations

KV_NAME = "raycdc-shared-kv"


def _actor_cls():
    import ray

    @ray.remote(num_cpus=0)
    class _KV:
        """Plain dict + hit/miss counters. num_cpus=0: the actor only
        shuttles small keys and ObjectRefs; it must never reserve a slot a
        worker could use."""

        def __init__(self):
            self._d: dict = {}
            self._hits = 0
            self._misses = 0

        def get(self, key):
            if key in self._d:
                self._hits += 1
                return (True, self._d[key])
            self._misses += 1
            return (False, None)

        def put(self, key, val) -> None:
            self._d[key] = val

        def putnx(self, key, val):
            """Set-if-absent; returns the WINNING value (first writer wins —
            two racing loaders converge on one cached object)."""
            if key in self._d:
                self._hits += 1
                return self._d[key]
            self._misses += 1
            self._d[key] = val
            return val

        def mget(self, keys: list):
            return [self._d.get(k) for k in keys]

        def delete(self, key) -> bool:
            return self._d.pop(key, None) is not None

        def clear(self) -> int:
            n = len(self._d)
            self._d.clear()
            return n

        def stats(self) -> dict:
            return {"size": len(self._d), "hits": self._hits,
                    "misses": self._misses}

    return _KV


# process-lifetime handles: a NON-detached named actor is garbage-collected
# the moment every handle to it drops, so a function-local handle would let
# the cache die between calls; pinning one handle per name here keeps the
# actor (and every ObjectRef it holds) alive for the process lifetime
# without resorting to detached actors that outlive their job
_HANDLES: dict = {}


def shared_kv(name: str = KV_NAME):
    """The cluster's shared KV actor: created on first ask, joined by
    every later ask of the same name (any process on the cluster).

    A CACHED handle is health-checked before reuse: a non-detached named
    actor dies with its owner (or with a ray.shutdown()/init cycle), and
    returning the stale handle would wedge this process on RayActorError
    forever when one get_if_exists call would mint a working replacement."""
    import ray as _ray

    h = _HANDLES.get(name)
    if h is not None:
        try:
            _ray.get(h.stats.remote(), timeout=10)
            return h
        except Exception:
            _HANDLES.pop(name, None)
    h = _actor_cls().options(name=name, get_if_exists=True).remote()
    _HANDLES[name] = h
    return h
