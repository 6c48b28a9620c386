"""User-extension surface: declarative pipeline steps with dependency
resolution — the Ray-native analog of the reference's job registry +
scheduler (``indexer/jobs/base_job.py:65-88,291-376``,
``indexer/controller/scheduler/job_scheduler.py:117-150,275-300`` in
/root/reference).

A :class:`Step` declares ``inputs`` / ``outputs`` (logical table names) and
a ``transform(tables: dict[str, Dataset]) -> dict[str, Dataset]``. The
:class:`Pipeline` resolves the step DAG with Kahn's algorithm (cycle →
error, duplicate producer → error, mirroring ``job_scheduler.py:185-188``),
prunes to the steps required for the requested outputs (BFS over
dependencies, mirroring ``:117-150``) and runs them in topological order.
Datasets stay lazy — the scheduler wires stages; Ray's streaming executor
pipelines them.
"""

from __future__ import annotations

from collections import deque


class Step:
    """Subclass and register. Class attributes declare the DAG edges."""

    inputs: list = []
    outputs: list = []
    # a filter step consumes only a PREDICATE-NARROWED slice of its source
    # tables; when EVERY required step is a filter, the pipeline runs in
    # filter mode and the union of the steps' source predicates is pushed
    # down to the source Datasets before any transform runs (the analog of
    # the reference's is_filter jobs whose collected get_filter() specs are
    # handed to the SOURCE job — job_scheduler.py:117-150, 194-256 and
    # base_job.py:279-288 in /root/reference).
    is_filter: bool = False

    def transform(self, tables: dict) -> dict:
        raise NotImplementedError

    def source_filter(self) -> dict:
        """``{source table name -> Ray ``Dataset.filter`` expression
        string}`` — the rows this filter step needs. Only consulted in
        filter mode. Expressions for the same table from different steps
        are OR-combined (a row any step wants must be loaded — same union
        semantics as the reference's ``filters`` list)."""
        return {}

    @classmethod
    def name(cls) -> str:
        # CamelCaseStep -> camel_case_step (reference's snake-case job keys,
        # indexer/jobs/base_job.py:131-132)
        import re

        return re.sub(r"(?<!^)(?=[A-Z])", "_", cls.__name__).lower()


class StepRegistry:
    def __init__(self):
        self._steps: list = []

    def register(self, cls):
        """Usable as a decorator: ``@registry.register``."""
        dup = {
            o
            for s in self._steps
            for o in s.outputs
            if o in cls.outputs
        }
        if dup:
            raise ValueError(
                f"duplicate producer for output(s) {sorted(dup)}: {cls.__name__}"
            )
        self._steps.append(cls)
        return cls

    def required_steps(self, wanted_outputs: list, available_inputs: set) -> list:
        """BFS over dependency types: the minimal step set producing
        ``wanted_outputs`` from ``available_inputs``."""
        producer = {o: s for s in self._steps for o in s.outputs}
        needed, queue = [], deque(wanted_outputs)
        seen = set()
        while queue:
            out = queue.popleft()
            if out in seen or out in available_inputs:
                continue
            seen.add(out)
            step = producer.get(out)
            if step is None:
                raise KeyError(f"no step produces {out!r} and it is not an input")
            if step not in needed:
                needed.append(step)
            for dep in step.inputs:
                queue.append(dep)
        return needed

    def topo_sort(self, steps: list, available_inputs: set) -> list:
        """Kahn's algorithm over the step DAG; raises on cycles."""
        produced_by = {o: s for s in steps for o in s.outputs}
        indeg = {s: 0 for s in steps}
        consumers: dict = {s: [] for s in steps}
        for s in steps:
            for dep in s.inputs:
                if dep in produced_by:
                    indeg[s] += 1
                    consumers[produced_by[dep]].append(s)
                elif dep not in available_inputs:
                    raise KeyError(f"{s.__name__} needs unavailable input {dep!r}")
        queue = deque(sorted((s for s in steps if indeg[s] == 0), key=lambda s: s.__name__))
        order = []
        while queue:
            s = queue.popleft()
            order.append(s)
            for c in consumers[s]:
                indeg[c] -= 1
                if indeg[c] == 0:
                    queue.append(c)
        if len(order) != len(steps):
            cyc = sorted(s.__name__ for s in steps if s not in order)
            raise ValueError(f"cycle in step graph involving: {cyc}")
        return order


class Pipeline:
    """Plan + run: resolve required steps for the wanted outputs, topo-sort,
    execute each ``transform`` feeding a shared table namespace (the typed
    analog of the reference's ``_data_buff``, but one lazy Dataset per
    logical table instead of row lists).

    Filter mode: iff EVERY required step declares ``is_filter`` (or the
    caller forces it), the union of the steps' ``source_filter()``
    predicates is applied to the source Datasets up front — Ray pushes the
    expression into the parquet scan, so the WHOLE pipeline runs over the
    filtered rows only (never "scan everything, discard later"). One
    non-filter step anywhere disables it, because that step's semantics
    need the full input (the reference's AND-fold,
    ``job_scheduler.py:117-150``)."""

    def __init__(self, registry: StepRegistry):
        self.registry = registry

    def _instantiate(self, cls) -> "Step":
        return cls()

    def run(
        self, tables: dict, wanted_outputs: list, force_filter_mode: bool = False
    ) -> dict:
        available = set(tables)
        steps = self.registry.required_steps(wanted_outputs, available)
        order = self.registry.topo_sort(steps, available)
        insts = [self._instantiate(cls) for cls in order]
        ns = dict(tables)
        if force_filter_mode or (bool(insts) and all(s.is_filter for s in insts)):
            union = self._union_filters(insts, available)
            if not force_filter_mode:
                # AUTO mode is union-of-WANTS: a filter step reading table
                # t WITHOUT declaring a predicate for t wants ALL of t —
                # pushing another step's predicate at it would silently
                # narrow its input. (FORCED mode is the caller's explicit
                # override: every step reads the union slice, declared or
                # not — the reference's force_filter_mode semantics.)
                for inst in insts:
                    declared = set((inst.source_filter() or {}))
                    for tbl in type(inst).inputs:
                        if tbl in union and tbl not in declared:
                            del union[tbl]
            for tbl, expr in union.items():
                ns[tbl] = ns[tbl].filter(expr=expr)
        for inst in insts:
            cls = type(inst)
            produced = inst.transform(ns)
            unexpected = set(produced) - set(cls.outputs)
            if unexpected:
                raise ValueError(f"{cls.__name__} produced undeclared {unexpected}")
            missing = set(cls.outputs) - set(produced)
            if missing:
                # fail at the culprit, not as a bare KeyError downstream
                raise ValueError(
                    f"{cls.__name__} declared but did not produce "
                    f"{sorted(missing)}"
                )
            ns.update(produced)
        return {o: ns[o] for o in wanted_outputs}

    @staticmethod
    def _union_filters(insts: list, available: set) -> dict:
        """OR-combine the steps' per-table source predicates."""
        preds: dict = {}
        for inst in insts:
            for tbl, expr in (inst.source_filter() or {}).items():
                if tbl not in available:
                    raise KeyError(
                        f"{type(inst).__name__}.source_filter names {tbl!r}, "
                        "which is not a source table"
                    )
                preds[tbl] = (
                    expr if tbl not in preds else f"({preds[tbl]}) or ({expr})"
                )
        return preds

    def run_entities(self, tables: dict, entity_types: str, bundles) -> dict:
        """Entity-bundle front door: expand ``"core,analytics"`` via the
        :class:`BundleRegistry` and run the pruned DAG."""
        return self.run(tables, bundles.expand(entity_types))


# -- auto-discovery + per-step config (reference parity) --------------------


def discover(registry: StepRegistry, package) -> list:
    """Import every submodule of ``package`` and register the Step
    subclasses found — the analog of the reference's
    ``import_submodules("indexer.modules")`` + metaclass registry
    (``indexer/controller/scheduler/job_scheduler.py:24``,
    ``indexer/jobs/base_job.py:65-88``). Already-registered classes (e.g.
    via the ``@registry.register`` decorator at import time) are skipped.
    Returns the newly registered classes."""
    import importlib
    import inspect
    import pkgutil

    if isinstance(package, str):
        package = importlib.import_module(package)
    modules = [package]
    if hasattr(package, "__path__"):
        for info in pkgutil.iter_modules(package.__path__):
            modules.append(
                importlib.import_module(f"{package.__name__}.{info.name}")
            )
    added = []
    have = set(registry._steps)
    for mod in modules:
        for _, obj in inspect.getmembers(mod, inspect.isclass):
            if (
                issubclass(obj, Step)
                and obj is not Step
                and obj.__module__ == mod.__name__
                and obj not in have
            ):
                registry.register(obj)
                have.add(obj)
                added.append(obj)
    return added


def load_step_config(path: str) -> dict:
    """Per-step config file (YAML or JSON), keyed by snake-case step name —
    the reference's ``config/indexer-config-*.yaml`` per-job sections
    (``indexer/jobs/base_job.py:131-132``)."""
    import json

    with open(path) as f:
        text = f.read()
    if path.endswith((".yaml", ".yml")):
        import yaml

        return yaml.safe_load(text) or {}
    return json.loads(text or "{}")


# -- entity-type bundles ----------------------------------------------------


class BundleRegistry:
    """Named bundles of logical outputs, combinable with ``,`` / ``ALL`` —
    the analog of the reference's ``EntityType`` IntFlag +
    ``calculate_entity_value`` + ``generate_output_types``
    (``enumeration/entity_type.py:57-215`` in /root/reference): users ask
    for coarse entity groups ("explorer_base,token"), the scheduler expands
    them to the exact output-table set and prunes the step DAG to it."""

    def __init__(self):
        self._bundles: dict = {}

    def register(self, name: str, outputs: list) -> None:
        key = name.strip().upper()
        if key in self._bundles:
            raise ValueError(f"duplicate bundle {key!r}")
        if key == "ALL":
            raise ValueError("ALL is reserved (union of every bundle)")
        self._bundles[key] = list(outputs)

    def names(self) -> list:
        return sorted(self._bundles)

    def expand(self, entity_types: str) -> list:
        """``"core,analytics"`` → ordered de-duplicated output list.
        Mirrors ``calculate_entity_value`` (comma-split, case-insensitive,
        unknown name → error listing the valid ones) and the ``ALL``
        catch-all (``entity_type.py:123-145``)."""
        wanted: list = []
        for name in entity_types.split(","):
            key = name.strip().upper()
            if not key:
                continue
            if key == "ALL":
                groups = [self._bundles[k] for k in sorted(self._bundles)]
            elif key in self._bundles:
                groups = [self._bundles[key]]
            else:
                raise ValueError(
                    f"unknown entity type {name.strip()!r}; valid: "
                    f"{self.names() + ['ALL']}"
                )
            for outs in groups:
                for o in outs:
                    if o not in wanted:
                        wanted.append(o)
        return wanted


class ConfiguredPipeline(Pipeline):
    """Pipeline whose steps receive their config section at construction:
    a step may define ``__init__(self, **config)`` (or accept none). The
    section key is the step's snake-case name. Inherits ``run`` (filter
    mode included) — only instantiation differs."""

    def __init__(self, registry: StepRegistry, config: dict | None = None):
        super().__init__(registry)
        self.config = config or {}

    def _instantiate(self, cls) -> "Step":
        kwargs = self.config.get(cls.name(), {})
        return cls(**kwargs) if kwargs else cls()
