"""Partitioned Parquet lake: fragment IO, commit manifest, epoch fencing,
bounded undo buffer, rollback.

The durability/exactly-once layer — the analog of the reference's PostgreSQL
tables + ``sync_recorder`` cursor checkpoint
(``indexer/utils/sync_recorder.py:19-100``), reorg journal / repair
(``indexer/utils/reorg.py:12-69``, ``indexer/controller/reorg_controller.py:28-93``)
and its idempotent re-run-a-range semantics
(``indexer/controller/stream_controller.py:101-103,123-153``).

Design:
  * ``fragments/part=<p>/frag-<round>.parquet`` — one live fragment per hash
    partition, rewritten only by rounds that touch the partition. File names
    are deterministic per (partition, round): re-running a crashed round
    rewrites identical files, so replay is idempotent.
  * ``manifest.json`` — single atomic (tmp+rename) commit point: committed
    rounds (epoch ids + cursor range + metrics), per-partition fragment
    version history (the undo buffer, bounded to the last
    ``undo_window`` rounds — Hemera's reorg ``--ranges`` analog,
    ``cli/reorg.py:86-93``), and the current Arrow schema (schema evolution
    is committed with the round that introduced it).
  * crash-at-any-point: fragments written but manifest unswapped → the round
    is not committed; replay rewrites the same files and commits. A
    committed round found in the manifest is skipped (epoch fencing).
"""

from __future__ import annotations

import base64
import json
import os
import time

import pyarrow as pa

MANIFEST = "manifest.json"
FRAGMENT_DIR = "fragments"

# process-wide writer-lock registry: every Lake object in THIS process for
# the same root shares one OS lock (flock conflicts between fds even within
# a process, and same-process multi-Engine use is legitimate — shared
# merger pools, resume tests)
_WRITER_LOCKS: dict = {}

# per-root manifest write serials (same process): stale-handle fence for
# _write_manifest — see there
_MANIFEST_SERIALS: dict = {}


class LakeLockedError(RuntimeError):
    """Another PROCESS holds the writer lock for this lake root."""


def _schema_to_str(schema: pa.Schema) -> str:
    return base64.b64encode(schema.serialize().to_pybytes()).decode()


def _schema_from_str(s: str) -> pa.Schema:
    return pa.ipc.read_schema(pa.BufferReader(base64.b64decode(s)))


class Lake:
    """Driver-side handle for the lake directory. Single-writer (the driver
    owns the manifest commit — the epoch fence, SURVEY.md §7.3)."""

    def __init__(self, root: str, num_partitions: int = 64, undo_window: int = 8):
        self.root = root
        self.manifest_path = os.path.join(root, MANIFEST)
        self._manifest_serial = _MANIFEST_SERIALS.get(
            os.path.abspath(root), 0
        )
        os.makedirs(os.path.join(root, FRAGMENT_DIR), exist_ok=True)
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                self.manifest = json.load(f)
        else:
            self.manifest = {
                "version": 1,
                "num_partitions": num_partitions,
                # partition-hash function id, pinned at creation: the
                # key→partition map must be identical across the lake's
                # whole life (see raycdc.partition). Manifests written
                # before this field existed default to 1 (pandas hash).
                "hash_version": 2,
                "undo_window": undo_window,
                "schema": None,  # set at first commit
                "committed_rounds": [],
                # part(str) -> list of {"round": str, "file": relpath} (oldest..live)
                "partitions": {},
                # applied reorg rollbacks: {"epoch", "to_cursor",
                # "undone_epochs", "undone_rounds"} — makes rollback replay
                # idempotent (a re-discovered rollback epoch is skipped) and
                # lets the stream controller treat orphaned epochs as done
                "applied_rollbacks": [],
            }

    # -- introspection -----------------------------------------------------

    @property
    def num_partitions(self) -> int:
        return self.manifest["num_partitions"]

    @property
    def hash_version(self) -> int:
        return int(self.manifest.get("hash_version", 1))

    @property
    def schema(self) -> pa.Schema | None:
        s = self.manifest["schema"]
        return _schema_from_str(s) if s else None

    def committed_round_ids(self) -> set:
        return {r["round_id"] for r in self.manifest["committed_rounds"]}

    def applied_rollback_epochs(self) -> set:
        return {
            int(rb["epoch"])
            for rb in self.manifest.get("applied_rollbacks", [])
            if rb.get("epoch") is not None
        }

    def orphaned_epochs(self) -> set:
        """Epochs whose effects were intentionally discarded by an applied
        rollback (the non-canonical side of a reorg) — a replay must not
        re-apply them once the rollback itself is fenced."""
        out: set = set()
        for rb in self.manifest.get("applied_rollbacks", []):
            out.update(int(e) for e in rb.get("undone_epochs", []))
        return out

    def processed_epochs(self) -> set:
        """Every epoch whose work is complete: committed with a round,
        applied as a rollback, or orphaned by one. The stream controller's
        pending-work predicate (raycdc.stream.follow)."""
        done: set = set()
        for r in self.manifest["committed_rounds"]:
            done.update(int(e) for e in r["epochs"])
        done |= self.applied_rollback_epochs()
        done |= self.orphaned_epochs()
        return done

    def last_cursor(self) -> int:
        rounds = self.manifest["committed_rounds"]
        return rounds[-1]["cursor_hi"] if rounds else 0

    def live_state_map(self, part_range: tuple | None = None) -> dict:
        """part -> {"base": abspath|None, "deltas": [abspaths]}: the current
        base fragment plus the delta fragments committed since it. The
        partition's state is the (cursor, seq) arg-max fold of all of them
        — the base+delta log-structured layout that keeps per-round write
        volume O(round), not O(lake). ``part_range`` (lo, hi) restricts to
        one logical table's partition namespace (raycdc.tables)."""
        out = {}
        for p, versions in self.manifest["partitions"].items():
            p = int(p)
            if part_range is not None and not (part_range[0] <= p < part_range[1]):
                continue
            base, deltas = None, []
            for v in versions:
                if v.get("kind", "base") == "base":
                    base, deltas = os.path.join(self.root, v["file"]), []
                else:
                    deltas.append(os.path.join(self.root, v["file"]))
            out[p] = {"base": base, "deltas": deltas}
        return out

    def round_position(self, round_id: str) -> int:
        """Index of a committed round in the ledger (KeyError if unknown)."""
        for i, r in enumerate(self.manifest["committed_rounds"]):
            if r["round_id"] == round_id:
                return i
        raise KeyError(f"round {round_id!r} is not a committed round")

    def round_id_at_cursor(self, cursor_hi: int) -> str:
        """The committed round whose high watermark is ``cursor_hi`` —
        the same boundary resolution :meth:`rollback` uses (snapshots, like
        rollbacks, target whole committed rounds). When two rounds share a
        cursor_hi (a reshard barrier duplicates the head's watermark), the
        LAST one is the live state at that cursor — preferring the first
        would make the post-reshard head unreachable by cursor."""
        for r in reversed(self.manifest["committed_rounds"]):
            if r["cursor_hi"] == cursor_hi:
                return r["round_id"]
        raise ValueError(
            f"cursor {cursor_hi} is not a committed round boundary "
            f"(committed: "
            f"{[r['cursor_hi'] for r in self.manifest['committed_rounds']]})"
        )

    # -- snapshot tags (named refs on committed round boundaries) ----------

    @property
    def tags(self) -> dict:
        """name -> round_id of every snapshot tag (copy)."""
        return dict(self.manifest.get("tags", {}))

    def round_for_tag(self, name: str) -> str:
        try:
            return self.manifest.get("tags", {})[name]
        except KeyError:
            raise KeyError(
                f"unknown tag {name!r} (tags: "
                f"{sorted(self.manifest.get('tags', {}))})"
            ) from None

    def tag(self, name: str, round_id: str | None = None,
            cursor: int | None = None) -> str:
        """Pin a NAMED SNAPSHOT REF to a committed round boundary (default:
        the latest). Tagged rounds are RETAINED: GC keeps every fragment
        version needed to reconstruct them (so ``state_map_as_of`` serves
        them even outside the undo window), and ``rollback`` refuses to
        undo a pinned round until the tag is dropped. The Iceberg-tag
        analog of the reference's named sync checkpoints
        (``indexer/controller/scheduler/job_scheduler.py`` keeps a durable
        named position per pipeline). Returns the pinned round_id."""
        self.ensure_writer_lock()
        rounds = self.manifest["committed_rounds"]
        if not rounds:
            raise ValueError("cannot tag an empty lake (no committed rounds)")
        if cursor is not None:
            round_id = self.round_id_at_cursor(cursor)
        if round_id is None:
            round_id = rounds[-1]["round_id"]
        idx = self.round_position(round_id)  # KeyError if unknown
        if idx < self.manifest.get("reshard_floor", -1):
            raise ValueError(
                f"round {round_id!r} predates the reshard barrier — its "
                "layout no longer exists"
            )
        age = len(rounds) - 1 - idx
        if age >= self.manifest["undo_window"] and round_id not in set(
            self.manifest.get("tags", {}).values()
        ):
            # GC has (or may have) already trimmed what this snapshot
            # needs — tags pin LIVE history, they can't resurrect it
            raise ValueError(
                f"round {round_id!r} is {age} rounds old — outside "
                f"undo_window={self.manifest['undo_window']}; tags must be "
                "created while the snapshot is still in-window"
            )
        tags = self.manifest.setdefault("tags", {})
        existing = tags.get(name)
        if existing is not None and existing != round_id:
            raise ValueError(
                f"tag {name!r} already pins round {existing!r}; drop it first"
            )
        tags[name] = round_id
        self._write_manifest()
        return round_id

    def drop_tag(self, name: str) -> None:
        """Remove a snapshot tag. History the tag alone was retaining
        becomes GC-eligible immediately (manifest-swap-before-delete, as
        everywhere)."""
        self.ensure_writer_lock()
        tags = self.manifest.setdefault("tags", {})
        if name not in tags:
            raise KeyError(f"unknown tag {name!r}")
        del tags[name]
        doomed = self._gc()
        self._write_manifest()
        self._reap(doomed)

    def identity(self) -> str:
        """This lake's durable identity, stamped into the manifest on
        first use (branch lineage and replica journals both trust IDENTITY
        rather than ledger coincidence — round ids and cursor boundaries
        are deterministic per epoch numbering, so unrelated lakes can
        collide on both)."""
        if not self.manifest.get("lake_id"):
            import uuid

            self.ensure_writer_lock()
            self.manifest["lake_id"] = uuid.uuid4().hex
            self._write_manifest()
        return self.manifest["lake_id"]

    def branch(self, dest: str, round_id: str | None = None,
               tag: str | None = None) -> dict:
        """Create a ZERO-COPY WRITABLE BRANCH of this lake at a committed
        round boundary (default: the live head) — the LakeFS/Nessie
        branch / Delta shallow-clone analog. The branch is a fully
        independent lake directory: its manifest is this lake's ledger
        truncated at the branch point, and every fragment the snapshot
        needs is HARDLINKED (inode-shared, no data copied; falls back to
        a real copy across devices). Copy-on-write then holds by
        construction: every fragment write in the engine is
        tmp + ``os.replace`` and every delete is an unlink, so neither
        side can ever mutate the shared inode under the other — the
        branch diverges freely (new rounds, compaction, vacuum, even
        reshard) without touching the source, and survives source vacuum
        outright.

        Same boundary guards as snapshots: the branch point must be
        inside the undo window or pinned by a tag, and cannot predate a
        reshard barrier. Tags at or before the branch point carry over;
        consumer offsets do NOT (a branch is a new feed universe).
        Returns {"round_id", "n_files", "linked", "copied"}."""
        import shutil

        if tag is not None:
            round_id = self.round_for_tag(tag)
        rounds = self.manifest["committed_rounds"]
        if not rounds:
            raise ValueError("cannot branch an empty lake")
        # provenance: stamp the child with this lake's durable identity —
        # merge_branch trusts LINEAGE, not ledger coincidence
        self.identity()
        # hold the writer lock for the whole link loop: a concurrent
        # vacuum/compaction in another process could otherwise unlink a
        # chain file mid-branch (FileNotFoundError, partial dest). With
        # the lock, that other process fails fast at ITS ensure_writer_lock
        # instead — and if it already holds the lock, we fail fast here.
        self.ensure_writer_lock()
        if round_id is None:
            round_id = rounds[-1]["round_id"]
        idx = self.round_position(round_id)
        # validation only (undo-window / reshard guards); the manifest walk
        # below re-derives the same chains WITH their version metadata
        self.state_map_as_of(round_id)
        if os.path.exists(os.path.join(dest, MANIFEST)):
            raise ValueError(f"branch destination {dest!r} is already a lake")
        if os.path.isdir(os.path.join(dest, FRAGMENT_DIR)):
            # a fragments dir with no manifest is either foreign content or
            # debris from a pre-cleanup partial branch; refuse rather than
            # risk mixing or (on failure) deleting files we did not create
            raise ValueError(
                f"branch destination {dest!r} already contains a "
                f"'{FRAGMENT_DIR}' directory — remove it first"
            )
        # failure cleanup must not destroy PRE-EXISTING user content: only
        # remove the whole dest if we created it; otherwise remove just
        # what the branch populated (fragments dir + manifest temp)
        dest_created = not os.path.exists(dest)
        os.makedirs(os.path.join(dest, FRAGMENT_DIR), exist_ok=True)

        def _cleanup_partial() -> None:
            if dest_created:
                shutil.rmtree(dest, ignore_errors=True)
            else:
                shutil.rmtree(
                    os.path.join(dest, FRAGMENT_DIR), ignore_errors=True
                )
                try:
                    os.remove(os.path.join(dest, MANIFEST + ".tmp"))
                except OSError:
                    pass
        allowed = {r["round_id"] for r in rounds[: idx + 1]}
        # Retention matches _gc over the BRANCH's ledger: keep, per
        # partition, everything from the newest base at-or-before the
        # oldest anchor (undo-window floor and every carried-over tag) —
        # NOT just the newest base. Keeping only the live chain would make
        # carried tags serve empty snapshots and let a within-window
        # rollback on the branch silently delete its only base.
        kept_rounds = rounds[: idx + 1]
        bpos = {r["round_id"]: i for i, r in enumerate(kept_rounds)}
        min_anchor = max(0, len(kept_rounds) - self.manifest["undo_window"])
        for _rid in self.manifest.get("tags", {}).values():
            if _rid in bpos:
                min_anchor = min(min_anchor, bpos[_rid])
        new_parts: dict = {}
        linked = copied = 0
        try:
            for p, versions in self.manifest["partitions"].items():
                vs = [dict(v) for v in versions if v["round"] in allowed]
                first_keep = 0
                for i, v in enumerate(vs):
                    vpos = bpos.get(v["round"])
                    if (
                        vpos is not None
                        and vpos <= min_anchor
                        and v.get("kind", "base") == "base"
                    ):
                        first_keep = i
                chain = vs[first_keep:]
                if not chain:
                    continue
                for v in chain:
                    src_abs = os.path.join(self.root, v["file"])
                    dst_abs = os.path.join(dest, v["file"])
                    os.makedirs(os.path.dirname(dst_abs), exist_ok=True)
                    try:
                        os.link(src_abs, dst_abs)
                        linked += 1
                    except OSError:
                        shutil.copy2(src_abs, dst_abs)
                        copied += 1
                new_parts[p] = chain
        except Exception:
            # never leave a half-populated dest behind: it has no manifest
            # yet, so nothing references it — remove so a retry starts clean
            _cleanup_partial()
            raise
        man = {
            "version": self.manifest["version"],
            "num_partitions": self.manifest["num_partitions"],
            "hash_version": self.manifest.get("hash_version", 1),
            "undo_window": self.manifest["undo_window"],
            "schema": self.manifest["schema"],
            "committed_rounds": json.loads(
                json.dumps(rounds[: idx + 1])
            ),
            "partitions": new_parts,
            # keep rollback records that belong to the prefix's EPOCH
            # history (stream replay fencing on the branch needs them —
            # dropping one would make the branch re-execute the rollback
            # and truncate its own inherited rounds). Rollback rounds are
            # never committed rounds, so membership is by epoch: any
            # recorded rollback at or before the prefix's max epoch is
            # part of the state being branched.
            "applied_rollbacks": json.loads(json.dumps([
                rb
                for rb in self.manifest.get("applied_rollbacks", [])
                if rb.get("epoch") is None
                or int(rb["epoch"]) <= max(
                    (int(e) for r in rounds[: idx + 1] for e in r["epochs"]),
                    default=-1,
                )
            ])),
            "tags": {
                n: rid
                for n, rid in self.manifest.get("tags", {}).items()
                if rid in allowed
            },
        }
        if "reshard_floor" in self.manifest:
            man["reshard_floor"] = self.manifest["reshard_floor"]
        import uuid

        man["lake_id"] = uuid.uuid4().hex  # the branch's own identity
        man["branched_from"] = self.manifest["lake_id"]
        man["branch_base"] = round_id
        try:
            tmp = os.path.join(dest, MANIFEST + ".tmp")
            with open(tmp, "w") as f:
                json.dump(man, f)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, os.path.join(dest, MANIFEST))
        except Exception:
            _cleanup_partial()
            raise
        return {
            "round_id": round_id,
            "n_files": linked + copied,
            "linked": linked,
            "copied": copied,
        }

    def state_map_as_of(
        self, round_id: str, part_range: tuple | None = None
    ) -> dict:
        """Like :meth:`live_state_map`, but reconstructing the partition
        state as of ``round_id`` — the time-travel read anchor. Bounded by
        the same ``undo_window`` that bounds rollback: the GC keeps, per
        partition, every in-window version plus the newest pre-window base
        and its following deltas, which is exactly what reconstructing any
        in-window snapshot needs. TAGGED rounds are exempt from the window
        bound — the GC retains whatever a tag needs (:meth:`tag`).
        Versions committed after ``round_id`` are skipped; a partition
        first touched later is absent (empty then)."""
        idx = self.round_position(round_id)
        rounds = self.manifest["committed_rounds"]
        tagged = set(self.manifest.get("tags", {}).values())
        if (
            round_id not in tagged
            and len(rounds) - 1 - idx >= self.manifest["undo_window"]
        ):
            raise ValueError(
                f"snapshot at {round_id} is {len(rounds) - 1 - idx} rounds "
                f"old — outside undo_window={self.manifest['undo_window']}"
            )
        if idx < self.manifest.get("reshard_floor", -1):
            raise ValueError(
                f"snapshot at {round_id} predates the reshard barrier "
                f"(round index {self.manifest['reshard_floor']}) — the "
                f"pre-reshard layout no longer exists"
            )
        allowed = {r["round_id"] for r in rounds[: idx + 1]}
        out = {}
        for p, versions in self.manifest["partitions"].items():
            p = int(p)
            if part_range is not None and not (part_range[0] <= p < part_range[1]):
                continue
            base, deltas, seen = None, [], False
            for v in versions:
                if v["round"] not in allowed:
                    continue
                seen = True
                if v.get("kind", "base") == "base":
                    base, deltas = os.path.join(self.root, v["file"]), []
                else:
                    deltas.append(os.path.join(self.root, v["file"]))
            if seen:
                out[p] = {"base": base, "deltas": deltas}
        return out

    def live_fragment_paths(self, part_range: tuple | None = None) -> list:
        paths = []
        for ent in self.live_state_map(part_range).values():
            if ent["base"]:
                paths.append(ent["base"])
            paths.extend(ent["deltas"])
        return sorted(paths)

    # -- fragment naming (deterministic → idempotent replay) ---------------

    def fragment_relpath(self, part: int, round_id: str, kind: str = "base") -> str:
        return os.path.join(
            FRAGMENT_DIR, f"part={part:05d}", f"{kind}-{round_id}.parquet"
        )

    def fragment_abspath(self, part: int, round_id: str, kind: str = "base") -> str:
        return os.path.join(self.root, self.fragment_relpath(part, round_id, kind))

    # -- single-writer lock ------------------------------------------------

    def ensure_writer_lock(self) -> None:
        """Exclusive CROSS-PROCESS writer lock on the lake root, taken at
        the first mutating operation and held for the process lifetime —
        the reference's FixRecord single-runner lock
        (``indexer/controller/reorg_controller.py:168-179`` in
        /root/reference): two stream/repair runners on one lake would
        otherwise last-writer-win the manifest and silently drop rounds.
        Readers never lock."""
        import fcntl

        key = os.path.abspath(self.root)
        if key in _WRITER_LOCKS:
            return
        f = open(os.path.join(self.root, ".writer.lock"), "w")
        try:
            fcntl.flock(f, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError:
            f.close()
            raise LakeLockedError(
                f"another process holds the writer lock for {self.root}; "
                "one writer per lake (single-runner discipline)"
            ) from None
        _WRITER_LOCKS[key] = f

    @staticmethod
    def release_writer_lock(root: str) -> None:
        """Release this process's writer lock (tests / clean handoff)."""
        f = _WRITER_LOCKS.pop(os.path.abspath(root), None)
        if f is not None:
            f.close()

    # -- commit ------------------------------------------------------------

    def commit_round(
        self,
        round_id: str,
        epochs: list,
        cursor_lo: int,
        cursor_hi: int,
        touched_parts: list,
        schema: pa.Schema,
        metrics: dict,
    ) -> None:
        """Atomically commit a round: swap live fragments for touched
        partitions, record lineage + metrics, trim the undo buffer."""
        self.ensure_writer_lock()
        if round_id in self.committed_round_ids():
            return  # fence: already committed → no-op (idempotent replay)
        if not self.manifest.get("lake_id"):
            # stamp identity on the WRITER path (lock already held): every
            # written lake then carries a durable id for branch lineage and
            # replica journals, and read-only consumers never need to
            # stamp-and-lock a foreign lake to learn it
            import uuid

            self.manifest["lake_id"] = uuid.uuid4().hex
        parts = self.manifest["partitions"]
        for entry in touched_parts:
            p, kind = entry if isinstance(entry, (tuple, list)) else (entry, "base")
            versions = parts.setdefault(str(int(p)), [])
            versions.append(
                {
                    "round": round_id,
                    "kind": kind,
                    "file": self.fragment_relpath(int(p), round_id, kind),
                }
            )
        self.manifest["schema"] = _schema_to_str(schema)
        self.manifest["committed_rounds"].append(
            {
                "round_id": round_id,
                "epochs": [int(e) for e in epochs],
                "cursor_lo": int(cursor_lo),
                "cursor_hi": int(cursor_hi),
                "touched_parts": [
                    int(e[0]) if isinstance(e, (tuple, list)) else int(e)
                    for e in touched_parts
                ],
                "committed_at": time.time(),
                "metrics": metrics,
            }
        )
        # manifest first, THEN delete newly-unreferenced files: a crash in
        # between leaves harmless orphan files, never a manifest pointing at
        # deleted fragments (crash-at-any-point contract, module docstring)
        doomed = self._gc()
        self._write_manifest()
        self._reap(doomed)

    def _reap(self, doomed: list) -> None:
        """Delete superseded fragment files AFTER the manifest swap,
        skipping any path a KEPT version still references — a compaction
        may rewrite a fragment in place at the same (partition, round,
        kind) path, and the superseded entry's doomed path must not take
        the live file with it."""
        live = {
            os.path.join(self.root, v["file"])
            for versions in self.manifest["partitions"].values()
            for v in versions
        }
        for path in doomed:
            if path in live:
                continue
            if os.path.exists(path):
                os.remove(path)

    def _write_manifest(self) -> None:
        # stale-handle fence: two Lake handles for the same root in ONE
        # process both pass the flock (the registry is per-process), so a
        # handle whose in-memory manifest predates another handle's write
        # would silently last-writer-win the file and drop committed
        # rounds. Serial numbers convert that into a loud error.
        key = os.path.abspath(self.root)
        cur = _MANIFEST_SERIALS.get(key, 0)
        if cur != self._manifest_serial:
            raise RuntimeError(
                f"stale Lake handle for {self.root}: another handle in this "
                f"process wrote the manifest (serial {cur} != loaded "
                f"{self._manifest_serial}) — re-open the lake instead of "
                "writing through a stale handle"
            )
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.manifest, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.manifest_path)
        # fsync the DIRECTORY so the rename itself is durable before any
        # caller deletes superseded fragments: on power loss the old
        # manifest must never survive alongside already-unlinked files
        try:
            dfd = os.open(self.root, os.O_RDONLY)
            try:
                os.fsync(dfd)
            finally:
                os.close(dfd)
        except OSError:
            pass
        self._manifest_serial = cur + 1
        _MANIFEST_SERIALS[key] = self._manifest_serial

    def _gc(self) -> list:
        """Trim per-partition history to versions from the last
        ``undo_window`` committed rounds, PLUS whatever any snapshot tag
        needs. Returns the now-unreferenced fragment paths — the caller
        deletes them AFTER the manifest swap."""
        rounds = self.manifest["committed_rounds"]
        pos = {r["round_id"]: i for i, r in enumerate(rounds)}
        # ANCHORS: every round whose state must stay reconstructible — the
        # oldest in-window round and every tagged round. Keeping, per
        # partition, everything from the newest base at-or-before the
        # OLDEST anchor reconstructs state at every anchor (a base is a
        # restore point; every later version is retained).
        min_anchor = max(0, len(rounds) - self.manifest["undo_window"])
        for rid in self.manifest.get("tags", {}).values():
            if rid in pos:
                min_anchor = min(min_anchor, pos[rid])
        doomed = []
        for p, versions in self.manifest["partitions"].items():
            if len(versions) <= 1:
                continue
            first_keep = 0
            for i, v in enumerate(versions):
                vpos = pos.get(v["round"])
                if (
                    vpos is not None
                    and vpos <= min_anchor
                    and v.get("kind", "base") == "base"
                ):
                    first_keep = i
            kept = versions[first_keep:]
            doomed.extend(
                os.path.join(self.root, v["file"]) for v in versions[:first_keep]
            )
            self.manifest["partitions"][p] = kept
        return doomed

    def vacuum(self) -> list:
        """Delete fragment files under ``fragments/`` not referenced by ANY
        manifest version — crash leftovers (a round that wrote fragments
        but died before its manifest commit, interrupted post-commit GC
        deletions, stray ``.tmp`` renames). Safe by the crash-ordering
        contract: the manifest never references a file that was not fully
        written, so anything unreferenced is garbage; uncommitted-round
        fragments are rewritten byte-identically on replay. Mutating →
        writer lock. Returns the deleted paths."""
        self.ensure_writer_lock()
        referenced = {
            os.path.normpath(os.path.join(self.root, v["file"]))
            for versions in self.manifest["partitions"].values()
            for v in versions
        }
        deleted = []
        frag_root = os.path.join(self.root, FRAGMENT_DIR)
        for dirpath, _, files in os.walk(frag_root):
            for f in files:
                p = os.path.normpath(os.path.join(dirpath, f))
                if p not in referenced:
                    os.remove(p)
                    deleted.append(p)
        return sorted(deleted)

    def commit_compaction(self, parts: list) -> None:
        """Record a maintenance compaction: each partition in ``parts``
        gains a fresh base fragment TAGGED WITH THE LAST COMMITTED ROUND —
        a state-equivalent rewrite at an existing boundary, so the round
        ledger (and therefore cursor→round resolution, rollback targets,
        epoch fencing) is untouched. Rolling back that round deletes the
        compacted base together with the round's deltas — consistent by
        construction. GC then trims the superseded versions on the usual
        manifest-swap-before-delete ordering."""
        self.ensure_writer_lock()
        rounds = self.manifest["committed_rounds"]
        if not rounds:
            raise ValueError("compaction needs at least one committed round")
        round_id = rounds[-1]["round_id"]
        for p in parts:
            self.manifest["partitions"][str(int(p))].append(
                {
                    "round": round_id,
                    "kind": "base",
                    "file": self.fragment_relpath(int(p), round_id, "base"),
                }
            )
        doomed = self._gc()
        self._write_manifest()
        self._reap(doomed)

    def commit_reshard(
        self, new_nparts: int, touched_parts: list, round_id: str
    ) -> None:
        """Atomically swap in a RESHARDED layout: the manifest's partition
        map is REPLACED by one fresh base per new partition (written by
        the caller under ``round_id``), ``num_partitions`` changes, and a
        zero-event maintenance round is appended to the ledger so resume
        fencing sees the barrier. Reshard is a HISTORY BARRIER: rollbacks
        and time-travel snapshots cannot cross it (the pre-reshard layout
        is deleted), enforced via ``reshard_floor``. Crash ordering is the
        house contract — manifest first, then delete the old layout's
        files; a crash in between leaves harmless orphans for vacuum."""
        self.ensure_writer_lock()
        rounds = self.manifest["committed_rounds"]
        if not rounds:
            raise ValueError("reshard needs at least one committed round")
        if round_id in self.committed_round_ids():
            return  # idempotent replay
        if self.manifest.get("tags"):
            # reshard replaces the whole layout — every tag's snapshot
            # would become unreadable; force an explicit drop instead of
            # silently breaking named refs
            raise ValueError(
                f"snapshot tag(s) {sorted(self.manifest['tags'])} pin "
                "pre-reshard history; drop them before resharding"
            )
        last = rounds[-1]
        old_files = [
            os.path.join(self.root, v["file"])
            for versions in self.manifest["partitions"].values()
            for v in versions
        ]
        self.manifest["partitions"] = {
            str(int(p)): [
                {
                    "round": round_id,
                    "kind": "base",
                    "file": self.fragment_relpath(int(p), round_id, "base"),
                }
            ]
            for p in touched_parts
        }
        self.manifest["num_partitions"] = int(new_nparts)
        rounds.append(
            {
                "round_id": round_id,
                "epochs": [],
                "cursor_lo": int(last["cursor_hi"]),
                "cursor_hi": int(last["cursor_hi"]),
                "touched_parts": [int(p) for p in touched_parts],
                "committed_at": time.time(),
                "metrics": {"reshard_to": int(new_nparts)},
            }
        )
        self.manifest["reshard_floor"] = len(rounds) - 1
        self._write_manifest()
        for path in old_files:
            if os.path.exists(path):
                os.remove(path)

    # -- rollback (reorg analog) ------------------------------------------

    def rollback(self, to_cursor: int, rollback_epoch: int | None = None) -> None:
        """Restore lake state as of the committed round whose ``cursor_hi``
        equals ``to_cursor`` (rollbacks target committed boundaries — Hemera
        reorgs whole block ranges). Bounded by the undo window; older
        rollbacks raise, mirroring the reference's finite ``--ranges``
        repair window. ``rollback_epoch`` (when the rollback came from a
        stream epoch) is recorded so replaying the same log skips it."""
        self.ensure_writer_lock()
        rounds = self.manifest["committed_rounds"]
        if to_cursor == 0 and not rounds:
            return
        idx = None
        # prefer the LAST round at this boundary: a reshard barrier round
        # duplicates the previous head's cursor_hi, and the later round is
        # the live layout at that cursor (matching round_id_at_cursor)
        for i in range(len(rounds) - 1, -1, -1):
            if rounds[i]["cursor_hi"] == to_cursor:
                idx = i
                break
        if idx is None and to_cursor == 0:
            idx = -1
        if idx is None:
            raise ValueError(
                f"rollback_to_cursor={to_cursor} is not a committed round "
                f"boundary (committed: {[r['cursor_hi'] for r in rounds]})"
            )
        undone = rounds[idx + 1 :]
        if len(undone) >= self.manifest["undo_window"]:
            raise ValueError(
                f"rollback of {len(undone)} rounds exceeds undo_window="
                f"{self.manifest['undo_window']}"
            )
        if idx < self.manifest.get("reshard_floor", -1):
            raise ValueError(
                f"rollback to round index {idx} crosses the reshard barrier "
                f"at index {self.manifest['reshard_floor']} — the pre-reshard "
                f"layout no longer exists"
            )
        undone_ids = {r["round_id"] for r in undone}
        pinned = sorted(
            n for n, rid in self.manifest.get("tags", {}).items()
            if rid in undone_ids
        )
        if pinned:
            raise ValueError(
                f"rollback would undo round(s) pinned by tag(s) {pinned}; "
                "drop the tag(s) first"
            )
        doomed = []
        for p, versions in list(self.manifest["partitions"].items()):
            kept = [v for v in versions if v["round"] not in undone_ids]
            doomed.extend(
                os.path.join(self.root, v["file"])
                for v in versions
                if v["round"] in undone_ids
            )
            if kept:
                self.manifest["partitions"][p] = kept
            else:
                del self.manifest["partitions"][p]
        self.manifest["committed_rounds"] = rounds[: idx + 1]
        if rollback_epoch is not None:
            # stream-driven reorg: record it so replaying the same log skips
            # both the rollback epoch and the orphaned epochs (a canonical
            # replay of the range follows in the stream). MANUAL repair
            # rollbacks (CLI/reorg-controller analog) are deliberately NOT
            # recorded — their whole point is that a re-replay re-applies.
            self.manifest.setdefault("applied_rollbacks", []).append(
                {
                    "epoch": int(rollback_epoch),
                    "to_cursor": int(to_cursor),
                    "undone_epochs": sorted(
                        {int(e) for r in undone for e in r["epochs"]}
                    ),
                    "undone_rounds": sorted(undone_ids),
                    "applied_at": time.time(),
                }
            )
        # manifest swap BEFORE deleting the undone fragments — a crash in
        # between leaves orphan files, never a committed manifest whose live
        # fragments are gone (they are rewritten deterministically anyway)
        self._write_manifest()
        self._reap(doomed)
